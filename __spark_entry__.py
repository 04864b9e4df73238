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
from akkastreamprocessnpmpackagedependencies_spark.operators.quality import REG as QUAL
from akkastreamprocessnpmpackagedependencies_spark.operators.relational import REG as REL
from akkastreamprocessnpmpackagedependencies_spark.operators.scalarfuncs import REG as SCAL
from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import REG as SIM
from akkastreamprocessnpmpackagedependencies_spark.operators.textops import REG as TXT
from akkastreamprocessnpmpackagedependencies_spark.operators.timeseries import REG as TS
from akkastreamprocessnpmpackagedependencies_spark.operators.udx import REG as UDX

_MODULES = [REL, SCAL, TS, DEDUP, SIM, TXT, QUAL, MM, UDX]

# The driver's correctness gate consumes registry entries IN ORDER (it
# checks exactly the first 50), so ordering is evidence policy governed by
# ONE rule, enforced by ``tools/driver_check.py --staleness`` against the
# per-query fingerprints in tools/evidence.json: every query whose
# fingerprint differs from the code its last green CORRECTNESS row was
# computed against must be inside the window. Round 3 must-haves: the
# fingerprint-changed queries (flagship, approx_sketches,
# simhash_candidate_pairs, chargram_jaccard_pairs, embedding_neardup_pairs)
# plus every query new this round (the corpus-quality group,
# pack_sequences, tfidf_top_terms_per_doc, npm_reverse_dependency_counts,
# and the TPC-H gap shapes). Remaining slots rotate the OLDEST rows (the
# r1-resting set) so no green row ages past two rounds.
_PRIORITY = [
    # fingerprint-changed since their last recorded row
    *["npm_dependency_counts", "npm_reverse_dependency_counts",
      "approx_sketches", "simhash_candidate_pairs",
      "chargram_jaccard_pairs", "embedding_neardup_pairs"],
    # new in round 3: corpus-quality surface
    *["repetition_signals", "top_bigram_share", "quality_filter_composite",
      "fuzzy_dedup_keep_one", "semdedup_keep_one", "embedding_quantize_int8",
      "pack_sequences", "tfidf_top_terms_per_doc"],
    # new in round 3: TPC-H gap shapes (Q8/Q9/Q17/Q18/Q19/Q21)
    *["small_qty_part_revenue", "large_volume_customers", "bracket_revenue",
      "nation_market_share", "product_profit_by_nation_year",
      "late_shipment_suppliers"],
    # rotation: queries resting on round-1 rows, oldest evidence first
    *["forecast_revenue", "distinct_aggs", "stats_moments", "rollup_qty",
      "cube_qty", "grouping_sets_qty", "pivot_linestatus", "case_bucketing",
      "top_unshipped_orders", "supplier_volume_by_nation",
      "priority_with_returns", "customers_without_big_orders",
      "customer_order_counts", "topk_per_customer_agg",
      "top_orders_per_customer", "running_quantity_by_supplier",
      "order_gap_days", "top_orders_global", "window_rank_variants",
      "skew_salted_join", "idle_rich_customers", "top_revenue_suppliers",
      "promo_revenue_ratio", "set_intersect", "local_supplier_revenue",
      "returned_item_customers", "customer_churn_full_outer",
      "unpivot_part_metrics", "events_value_rolling_1h",
      "events_error_context_5m"],
    # displaced by the three new-in-r3 queries (new queries must get a
    # first row): dedup_exact_hash (valid r2 row), set_union and
    # deterministic_sample (r1 rows; code unchanged since, trivial
    # single-pass shapes). All three lead the r4 rotation.
]


def _ordered(items: dict) -> dict:
    head = {k: items[k] for k in _PRIORITY if k in items}
    return head | {k: v for k, v in items.items() if k not in head}


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


def _npm_reverse_dependency_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reverse-dependency report over the registry corpus: for every
    package NAMED as a dependency, how many (package, version, type) edges
    point at it. The reference's data model carries these names but
    discards them (reference: src/main/scala/Version.scala:8 ignores the
    map keys it counts); this query keeps the edge and aggregates the
    other end — the npm-domain generalization of the flagship. Plan: the
    doc parse + two map-key explodes are one narrow pass; the only
    shuffle is the final (dep_name, dep_type) hash agg. sf_dir unused —
    the fixture world is fixed-size by design."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(os.path.join(FIXTURES_DIR, "npm_registry_docs.parquet"))
    ver = npm.explode_versions(
        npm.parse_registry(docs.filter(F.col("status_code") == 200))
    )
    empty = F.array().cast("array<string>")
    edges = ver.select(
        F.explode(F.coalesce(F.map_keys("vdoc.dependencies"), empty)).alias("dep_name"),
        F.lit("runtime").alias("dep_type"),
    ).unionAll(
        ver.select(
            F.explode(F.coalesce(F.map_keys("vdoc.devDependencies"), empty)).alias("dep_name"),
            F.lit("dev").alias("dep_type"),
        )
    )
    return edges.groupBy("dep_name", "dep_type").agg(
        F.count("*").cast("long").alias("n_dependents")
    )


_NPM_REVERSE_ORACLE = f"""
    WITH docs AS (
      SELECT name, doc
      FROM read_parquet('{os.path.join(FIXTURES_DIR, "npm_registry_docs.parquet")}')
      WHERE status_code = 200 AND json_valid(doc)),
    ver AS (SELECT d.name AS package, unnest(json_keys(d.doc, '$.versions')) AS version,
                   d.doc
            FROM docs d),
    vdoc AS (SELECT package, version,
                    json_extract(doc, '$.versions."' || version || '"') AS vd
             FROM ver),
    deps AS (
      SELECT unnest(json_keys(vd, '$.dependencies')) AS dep_name,
             'runtime' AS dep_type FROM vdoc
      UNION ALL
      SELECT unnest(json_keys(vd, '$.devDependencies')), 'dev' FROM vdoc
    )
    SELECT dep_name, dep_type, CAST(count(*) AS BIGINT) AS n_dependents
    FROM deps GROUP BY dep_name, dep_type
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "npm_dependency_counts": _npm_dependency_counts,
        "npm_reverse_dependency_counts": _npm_reverse_dependency_counts,
    }
    for mod in _MODULES:
        out.update(mod.queries)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {
        "npm_dependency_counts": _NPM_ORACLE,
        "npm_reverse_dependency_counts": _NPM_REVERSE_ORACLE,
    }
    for mod in _MODULES:
        out.update(mod.oracles)
    return _ordered(out)
