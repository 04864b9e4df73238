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
from pyspark.sql import functions as F

from akkastreamprocessnpmpackagedependencies_spark.fixtures import FIXTURES_DIR
from akkastreamprocessnpmpackagedependencies_spark.operators import npm
from akkastreamprocessnpmpackagedependencies_spark.operators.advisor import REG as ADV
from akkastreamprocessnpmpackagedependencies_spark.operators.dedup import REG as DEDUP
from akkastreamprocessnpmpackagedependencies_spark.operators.multimodal import REG as MM
from akkastreamprocessnpmpackagedependencies_spark.operators.quality import REG as QUAL
from akkastreamprocessnpmpackagedependencies_spark.operators.relational import REG as REL
from akkastreamprocessnpmpackagedependencies_spark.operators.scalarfuncs import REG as SCAL
from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import REG as SIM
from akkastreamprocessnpmpackagedependencies_spark.operators.textops import REG as TXT
from akkastreamprocessnpmpackagedependencies_spark.operators.timeseries import REG as TS
from akkastreamprocessnpmpackagedependencies_spark.operators.udx import REG as UDX

_MODULES = [REL, SCAL, TS, DEDUP, SIM, TXT, QUAL, MM, UDX, ADV]

# The driver's correctness gate consumes registry entries IN ORDER (it
# checks exactly the first 50), so ordering is evidence policy governed by
# ONE rule, enforced by ``tools/driver_check.py --staleness`` against the
# per-query fingerprints in tools/evidence.json: every query whose
# fingerprint differs from the code its last green CORRECTNESS row was
# computed against must be inside the window, plus every query promised a
# fresh row via a ``must_rotate`` marker, plus every NEW query (no prior
# row exists). Prior windows live in git history (this list is rewritten
# every round).
_PRIORITY = [
    # Round-17 window (rebuilt after the round-17 OPTIMIZATION pass,
    # OPTIMIZATION_r17.md): demand = flagship + the 14 fingerprint-moved
    # queries (the containment revert, dup-ngram gate, capstone fusion,
    # contamination collect_set, the CC observe rippling through every
    # LSH/CC consumer, quality_flags carry hook, split_leakage_audit's
    # textops module hash, and the npm pagerank/transitive collaterals
    # through session.py's new table_bytes) + ALL 19 must_rotate-17
    # promises (the 14 r16-displaced rows + the 5 carried from r15) = 34,
    # leaving 16 slots filled with the oldest (r14) aged rows in
    # alphabetical order. The 26 still-displaced r14-aged rows carry
    # `--must-rotate 18` machine promises (tools/evidence.json).
    # Pre-handoff gate: `driver_check.py --handoff 17` green on the exact
    # checkout the driver measures.
    "npm_dependency_counts",
    # 14 fingerprint-moved
    "containment_prefix_pairs", "neardup_source_matrix",
    "minhash_lsh_neardup", "neardup_clusters",
    "chargram_jaccard_pairs", "dedup_incremental",
    "contamination_ngram_hits", "duplicate_ngram_overlap",
    "fuzzy_dedup_keep_one", "corpus_pipeline_verdicts",
    "split_leakage_audit", "quality_filter_composite",
    "npm_dependency_pagerank", "npm_transitive_deps",
    # 19 must_rotate-17 promises, all honored
    "stats_moments", "top_unshipped_orders",
    "supplier_volume_by_nation", "topk_per_customer_agg",
    "top_orders_per_customer", "running_quantity_by_supplier",
    "top_orders_global", "window_rank_variants",
    "skew_salted_join", "top_revenue_suppliers",
    "returned_item_customers", "small_qty_part_revenue",
    "zorder_bucket_profile", "unpivot_part_metrics",
    "asof_purchase_signup", "tfidf_top_terms_per_doc",
    "token_rarity_scores", "source_mixing_weights",
    "top_bigram_share",
    # 16 oldest (r14) aged rows
    "approx_sketches", "approx_sketches_exact",
    "date_funcs", "dedup_exact_summary",
    "dedup_normalized_hash", "doc_fingerprints",
    "embedding_centroids", "events_hourly_gapfill",
    "events_sessionize", "events_sliding_1h_30m",
    "events_tumbling_1h", "grouped_median_pandas",
    "json_corrupt_tolerant", "json_funcs",
    "lang_id_heuristic", "map_funcs",
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


PR_ITERS = 3
PR_DAMP = 0.85  # (1 - PR_DAMP) teleport mass, written 0.15 literally below
TC_HOPS = 3  # transitive-closure search depth


def _npm_edges(spark: SparkSession) -> DataFrame:
    """The distinct npm dependency edge list (src depends on dst, runtime +
    dev) — the graph the reference's data model carries but discards
    (Version.scala:8). Shared by the pagerank and transitive-closure
    queries; each oracle rebuilds the identical CTE chain."""
    docs = spark.read.parquet(os.path.join(FIXTURES_DIR, "npm_registry_docs.parquet"))
    ver = npm.explode_versions(
        npm.parse_registry(docs.filter(F.col("status_code") == 200))
    )
    empty = F.array().cast("array<string>")
    return (
        ver.select(
            F.col("package").alias("src"),
            F.explode(F.coalesce(F.map_keys("vdoc.dependencies"), empty)).alias("dst"),
        )
        .unionAll(
            ver.select(
                F.col("package").alias("src"),
                F.explode(F.coalesce(F.map_keys("vdoc.devDependencies"), empty)).alias("dst"),
            )
        )
        .distinct()
    )


def _npm_transitive_deps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded transitive closure over the npm dependency graph: every
    (package, dep) pair reachable in ≤ TC_HOPS hops with the MINIMUM hop
    count — "what does this package actually pull in", the install-time
    question the flagship's per-version counts only answer at depth 1.

    Frontier-style iterative expansion (bounded BFS): round h joins the
    previous frontier's dst against edge src — ONE equi-join shuffle per
    round, both sides keyed on the join column — then ``distinct()``
    collapses the frontier so path multiplicity never compounds
    (without it a dense graph multiplies candidate rows by average
    degree every round). The final min-hop agg dedupes across rounds.
    Each round's frontier is ``ckpt``-ed (the kmeans_fit idiom) so
    lineage stays FLAT in the hop count — without it round h's plan
    re-derives rounds 1..h-1; ``tests/test_plans.py`` proves the bound
    holds when TC_HOPS is raised. At real graph scale the edge list
    would additionally be pre-partitioned on src so every round reuses
    one exchange. The
    oracle is the identical expansion as a bounded recursive CTE —
    UNION ALL plus the same terminal min-hop GROUP BY, so both engines
    agree row-for-row even on cyclic subgraphs (depth bound, not visited
    set, terminates both). sf_dir unused — the fixture world is
    fixed-size."""
    from akkastreamprocessnpmpackagedependencies_spark.session import ckpt

    edges = ckpt(_npm_edges(spark))  # parsed once, reused every round
    frontier = edges.withColumn("hops", F.lit(1))
    reach = frontier
    for h in range(2, TC_HOPS + 1):
        frontier = ckpt(
            frontier.alias("f")
            .join(edges.alias("e"), F.col("f.dst") == F.col("e.src"))
            .select(
                F.col("f.src").alias("src"),
                F.col("e.dst").alias("dst"),
                F.lit(h).alias("hops"),
            )
            .distinct()
        )
        reach = reach.unionAll(frontier)
    return reach.groupBy("src", "dst").agg(
        F.min("hops").cast("long").alias("hops")
    ).select(F.col("src").alias("package"), F.col("dst").alias("dep"), "hops")


_NPM_TRANSITIVE_ORACLE = f"""
    WITH RECURSIVE docs AS (
      SELECT name, doc
      FROM read_parquet('{os.path.join(FIXTURES_DIR, "npm_registry_docs.parquet")}')
      WHERE status_code = 200 AND json_valid(doc)),
    ver AS (SELECT d.name AS package, unnest(json_keys(d.doc, '$.versions')) AS version, d.doc
            FROM docs d),
    vdoc AS (SELECT package, version,
                    json_extract(doc, '$.versions."' || version || '"') AS vd FROM ver),
    edges AS (
      SELECT DISTINCT package AS src, unnest(json_keys(vd, '$.dependencies')) AS dst FROM vdoc
      UNION
      SELECT DISTINCT package, unnest(json_keys(vd, '$.devDependencies')) FROM vdoc),
    r AS (
      SELECT src, dst, 1 AS hops FROM edges
      UNION ALL
      SELECT r.src, e.dst, r.hops + 1
      FROM r JOIN edges e ON e.src = r.dst
      WHERE r.hops < {TC_HOPS})
    SELECT src AS package, dst AS dep, CAST(min(hops) AS BIGINT) AS hops
    FROM r GROUP BY 1, 2
"""


def _npm_dependency_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the npm dependency graph (src = package, dst = the
    packages it depends on, runtime + dev, distinct) — "which packages
    does the ecosystem lean on", the natural ranking query over the edges
    the reference's data model carries but discards (Version.scala:8).
    PR_ITERS rounds of the damped power iteration with dangling-mass
    redistribution.

    Distributed shape per round (the 100 TB design): one shuffle — the
    contribution agg on dst; the edges⋈degree⋈rank joins all key on src,
    so pre-partitioning edges by src serves every round; the dangling
    mass and node count are 1-row broadcast frames. The edge list is
    ``ckpt``-ed once (parsed once, reused every round) and the rank frame
    per round, the kmeans_fit idiom — lineage stays FLAT in PR_ITERS
    (``tests/test_plans.py`` proves the bound when the constant is
    raised); without it round i's plan re-derives rounds 1..i-1. Every sum
    is the decimal convention, every scalar expression mirrors the
    oracle's shape, so the trajectory is engine-lockstep; the oracle
    unrolls the identical rounds as a CTE chain (the kmeans_assignments
    technique). sf_dir unused — the fixture world is fixed-size."""
    from akkastreamprocessnpmpackagedependencies_spark.session import ckpt

    edges = ckpt(_npm_edges(spark))  # parsed once, reused every round
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    nn = nodes.agg(F.count("*").alias("n"))
    pr = nodes.crossJoin(F.broadcast(nn)).select(
        "node", "n", (F.lit(1.0) / F.col("n")).alias("pr")
    )
    dec = "decimal(18,6)"
    for _ in range(PR_ITERS):
        contrib = (
            edges.join(deg, "src")
            .join(pr.select(F.col("node").alias("src"), "pr"), "src")
            .groupBy("dst")
            .agg(F.sum((F.col("pr") / F.col("deg")).cast(dec)).cast("double").alias("s"))
        )
        dang = (
            pr.join(deg, pr.node == deg.src, "left_anti")
            .agg(F.coalesce(F.sum(F.col("pr").cast(dec)).cast("double"), F.lit(0.0)).alias("dang"))
        )
        pr = ckpt(
            nodes.crossJoin(F.broadcast(nn))
            .join(contrib.select(F.col("dst").alias("node"), "s"), "node", "left")
            .crossJoin(F.broadcast(dang))
            .select(
                "node", "n",
                (
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85) * (F.coalesce(F.col("s"), F.lit(0.0)) + F.col("dang") / F.col("n"))
                ).alias("pr"),
            )
        )
    return pr.select("node", "pr")


def _sql_pagerank_ctes(iters: int) -> str:
    """The oracle's unrolled power iteration: round i's CTEs s{i} (per-node
    contribution sums), g{i} (dangling mass), p{i} (new ranks) mirror the
    Spark expressions shape-for-shape (decimal sums, double literals,
    identical parenthesization)."""
    fix = os.path.join(FIXTURES_DIR, "npm_registry_docs.parquet")
    ctes = [f"""docs AS (
      SELECT name, doc FROM read_parquet('{fix}')
      WHERE status_code = 200 AND json_valid(doc)),
    ver AS (SELECT d.name AS package, unnest(json_keys(d.doc, '$.versions')) AS version, d.doc
            FROM docs d),
    vdoc AS (SELECT package, version,
                    json_extract(doc, '$.versions."' || version || '"') AS vd FROM ver),
    edges AS (
      SELECT DISTINCT package AS src, unnest(json_keys(vd, '$.dependencies')) AS dst FROM vdoc
      UNION
      SELECT DISTINCT package, unnest(json_keys(vd, '$.devDependencies')) FROM vdoc),
    nodes AS (SELECT DISTINCT src AS node FROM edges UNION SELECT DISTINCT dst FROM edges),
    deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
    nn AS (SELECT count(*) AS n FROM nodes),
    p0 AS (SELECT node, CAST(1.0 AS DOUBLE) / nn.n AS pr FROM nodes CROSS JOIN nn)"""]
    for i in range(1, iters + 1):
        ctes.append(f"""s{i} AS (
      SELECT e.dst, CAST(sum(CAST(p.pr / d.deg AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM edges e JOIN deg d ON d.src = e.src JOIN p{i-1} p ON p.node = e.src
      GROUP BY e.dst),
    g{i} AS (
      SELECT coalesce(CAST(sum(CAST(p.pr AS DECIMAL(18,6))) AS DOUBLE), CAST(0.0 AS DOUBLE)) AS dang
      FROM p{i-1} p LEFT JOIN deg d ON d.src = p.node WHERE d.src IS NULL),
    p{i} AS (
      SELECT nodes.node,
             CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * (coalesce(s.s, CAST(0.0 AS DOUBLE)) + g.dang / nn.n) AS pr
      FROM nodes CROSS JOIN nn CROSS JOIN g{i} g LEFT JOIN s{i} s ON s.dst = nodes.node)""")
    return ",\n    ".join(ctes)


_NPM_PAGERANK_ORACLE = f"""
    WITH {_sql_pagerank_ctes(PR_ITERS)}
    SELECT node, pr FROM p{PR_ITERS}
"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {
        "npm_dependency_counts": _npm_dependency_counts,
        "npm_reverse_dependency_counts": _npm_reverse_dependency_counts,
        "npm_dependency_pagerank": _npm_dependency_pagerank,
        "npm_transitive_deps": _npm_transitive_deps,
    }
    for mod in _MODULES:
        out.update(mod.queries)
    return _ordered(out)


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {
        "npm_dependency_counts": _NPM_ORACLE,
        "npm_reverse_dependency_counts": _NPM_REVERSE_ORACLE,
        "npm_dependency_pagerank": _NPM_PAGERANK_ORACLE,
        "npm_transitive_deps": _NPM_TRANSITIVE_ORACLE,
    }
    for mod in _MODULES:
        out.update(mod.oracles)
    return _ordered(out)
