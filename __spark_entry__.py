"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship analytics query on sf0.001.
``queries()`` aggregates every operator module's registry; ``oracle_sql()``
returns the matching DuckDB SQL (omitted only for genuinely
non-SQL-expressible ops, which the driver checks rows-only).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from akkastreamprocessnpmpackagedependencies_spark.fixtures import FIXTURES_DIR
from akkastreamprocessnpmpackagedependencies_spark.operators import npm
from akkastreamprocessnpmpackagedependencies_spark.operators.dedup import REG as DEDUP
from akkastreamprocessnpmpackagedependencies_spark.operators.multimodal import REG as MM
from akkastreamprocessnpmpackagedependencies_spark.operators.relational import REG as REL
from akkastreamprocessnpmpackagedependencies_spark.operators.scalarfuncs import REG as SCAL
from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import REG as SIM
from akkastreamprocessnpmpackagedependencies_spark.operators.textops import REG as TXT
from akkastreamprocessnpmpackagedependencies_spark.operators.timeseries import REG as TS
from akkastreamprocessnpmpackagedependencies_spark.operators.udx import REG as UDX

_MODULES = [REL, SCAL, TS, DEDUP, SIM, TXT, MM, UDX]


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the reference's own query — per (package, version) runtime
    and dev dependency counts over the hermetic registry fixtures
    (reference: src/main/scala/Main.scala end-to-end). Driver checks
    rows>0 and schema stability."""
    return _npm_dependency_counts(spark, "/root/testdata/sf0.001")


def _npm_dependency_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's own query (hermetic): per (package, version), runtime
    and dev dependency counts from the frozen registry fixtures. sf_dir is
    unused — the fixture world is fixed-size by design."""
    packages = spark.read.parquet(os.path.join(FIXTURES_DIR, "npm_packages.parquet"))
    docs = spark.read.parquet(os.path.join(FIXTURES_DIR, "npm_registry_docs.parquet"))
    return npm.dependency_counts(packages, docs)


_NPM_ORACLE = f"""
    SELECT package, version, dependencies, "devDependencies"
    FROM read_parquet('{os.path.join(FIXTURES_DIR, "npm_expected_counts.parquet")}')
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "npm_dependency_counts": _npm_dependency_counts,
    }
    for mod in _MODULES:
        out.update(mod.queries)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {"npm_dependency_counts": _NPM_ORACLE}
    for mod in _MODULES:
        out.update(mod.oracles)
    return out
