"""Query registry: each operator module registers named queries with an
optional DuckDB oracle. ``__spark_entry__`` aggregates every module's
registry into the driver contract.

Numeric determinism convention (why the decimal casts everywhere):
double-precision SUM is order-dependent, and Spark's shuffle order differs
from DuckDB's scan order. So money aggregates compute the per-row value in
DOUBLE (IEEE arithmetic on identical inputs and expression shape is
engine-deterministic), cast ONCE to DECIMAL(18,6) (deterministic rounding —
binary doubles essentially never sit on a decimal tie), SUM the decimal
(exact, order-independent), and cast the final sum back to DOUBLE. Per-row
products are never multiplied as decimals — DuckDB's decimal multiplication
overflows at modest precisions. Integer-valued doubles (quantities) sum
exactly as doubles (< 2^53) and need no cast.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class Registry:
    def __init__(self) -> None:
        self.queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
        self.oracles: dict[str, str] = {}

    def add(self, name: str, oracle: str | None = None):
        def deco(fn: Callable[[SparkSession, str], DataFrame]):
            self.queries[name] = fn
            if oracle is not None:
                self.oracles[name] = oracle
            return fn

        return deco


DEC = "DECIMAL(18,6)"


def dsum(c: str | Column) -> Column:
    """Exact order-independent sum of a double expression, surfaced as
    double: cast the per-row double to decimal(18,6), sum exactly, cast
    back. SQL mirror: CAST(sum(CAST(expr AS DECIMAL(18,6))) AS DOUBLE)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.sum(col.cast(DEC)).cast("double")


def sql_dsum(expr: str) -> str:
    return f"CAST(sum(CAST({expr} AS {DEC})) AS DOUBLE)"
