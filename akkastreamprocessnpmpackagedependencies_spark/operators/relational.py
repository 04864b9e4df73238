"""Relational operator surface: scans, filters, projections, joins
(inner/left/semi/anti, broadcast), hash aggregations (plain, distinct,
rollup/cube/grouping sets), window functions (rank, lag, running frames),
sorts/top-k, set operations, pivot.

The reference implements none of these (SURVEY.md §2.8 — its one pipeline
has a single fold aggregation); this module is the driver-mandated
generalization, expressed declaratively so Catalyst does pushdown, pruning,
join selection and AQE re-planning.

Scale notes (100 TB):
- dimension joins (region/nation/supplier/customer) are explicitly
  ``F.broadcast`` — no shuffle of the fact table for dim enrichment;
- fact-fact joins (orders x lineitem) shuffle on the join key; both sides
  hash-partition on the same key so AQE can coalesce/skew-split;
- every aggregate here is partial-aggregatable (map-side combine);
- top-k is ORDER BY + LIMIT, which Spark executes as per-partition
  TakeOrdered + driver merge of k rows — never a global sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import load_table
from .registry import Registry, dsum, sql_dsum

REG = Registry()

_REV = "l_extendedprice * (1.0 - l_discount)"


def _revenue() -> Column:
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


# --------------------------------------------------------------------------
# aggregations
# --------------------------------------------------------------------------


@REG.add(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                             AS sum_qty,
           {sql_dsum("l_extendedprice")}                               AS sum_base_price,
           {sql_dsum(_REV)}                                            AS sum_disc_price,
           {sql_dsum(_REV + " * (1.0 + l_tax)")}                       AS sum_charge,
           sum(l_quantity) / count(*)                                  AS avg_qty,
           {sql_dsum("l_extendedprice")} / count(*)                    AS avg_price,
           {sql_dsum("l_discount")} / count(*)                         AS avg_disc,
           count(*)                                                    AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: filtered scan + 2-key hash agg with 8 aggregates.
    Filter + 7-column projection push into the parquet scan."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(_revenue()).alias("sum_disc_price"),
            dsum(_revenue() * (F.lit(1.0) + F.col("l_tax"))).alias("sum_charge"),
            (F.sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dsum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dsum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@REG.add(
    "forecast_revenue",
    f"""
    SELECT {sql_dsum("l_extendedprice * l_discount")} AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24
    """,
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight multi-predicate filter + global agg.
    All three predicates reach the parquet reader as PushedFilters."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount").between(0.02, 0.06))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


@REG.add(
    "distinct_aggs",
    """
    SELECT l_returnflag,
           count(DISTINCT l_suppkey) AS n_supp,
           count(DISTINCT l_partkey) AS n_part,
           count(*)                  AS n_rows
    FROM lineitem GROUP BY l_returnflag
    """,
)
def distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple COUNT(DISTINCT) in one agg — Spark expands + re-aggregates."""
    l = load_table(spark, sf_dir, "lineitem")
    return l.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count("*").alias("n_rows"),
    )


@REG.add(
    "stats_moments",
    f"""
    SELECT l_returnflag, n, sum_qty, sum_qty2, sum_disc, sum_disc2, sum_cross,
           median_qty,
           sqrt((sum_qty2 - sum_qty * sum_qty / n) / (n - 1))   AS stddev_qty,
           (sum_cross - sum_qty * sum_disc / n)
             / sqrt((sum_qty2 - sum_qty * sum_qty / n)
                    * (sum_disc2 - sum_disc * sum_disc / n))    AS corr_qty_disc
    FROM (
      SELECT l_returnflag,
             count(*)                                            AS n,
             sum(l_quantity)                                     AS sum_qty,
             sum(l_quantity * l_quantity)                        AS sum_qty2,
             {sql_dsum("l_discount")}                            AS sum_disc,
             {sql_dsum("l_discount * l_discount")}               AS sum_disc2,
             {sql_dsum("l_quantity * l_discount")}               AS sum_cross,
             quantile_cont(l_quantity, 0.5)                      AS median_qty
      FROM lineitem GROUP BY l_returnflag)
    """,
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (stddev, correlation, exact median) computed
    from exact raw moments. Spark's stddev/corr built-ins accumulate doubles
    in shuffle order, which is not reproducible across engines — so the
    moments are summed exactly (integer-valued doubles sum exactly; the
    fractional terms go through the decimal convention in registry.py, kept
    small enough that the decimal→double conversion is itself exact) and
    the statistics derive from them with one deterministic double
    expression. At scale this is also the right plan: raw moments are
    partial-aggregatable (map-side combine), and the median is the only
    sort-based term. Capabilities absent from the reference (SURVEY.md
    §2.8)."""
    l = load_table(spark, sf_dir, "lineitem")
    m = l.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("l_quantity").alias("sum_qty"),
        F.sum(F.col("l_quantity") * F.col("l_quantity")).alias("sum_qty2"),
        dsum("l_discount").alias("sum_disc"),
        dsum(F.col("l_discount") * F.col("l_discount")).alias("sum_disc2"),
        dsum(F.col("l_quantity") * F.col("l_discount")).alias("sum_cross"),
        F.percentile("l_quantity", 0.5).alias("median_qty"),
    )
    n, sq, sq2 = F.col("n"), F.col("sum_qty"), F.col("sum_qty2")
    sd, sd2, sx = F.col("sum_disc"), F.col("sum_disc2"), F.col("sum_cross")
    return m.select(
        "l_returnflag", "n", "sum_qty", "sum_qty2", "sum_disc", "sum_disc2",
        "sum_cross", "median_qty",
        F.sqrt((sq2 - sq * sq / n) / (n - F.lit(1))).alias("stddev_qty"),
        ((sx - sq * sd / n) / F.sqrt((sq2 - sq * sq / n) * (sd2 - sd * sd / n))).alias(
            "corr_qty_disc"
        ),
    )


@REG.add(
    "rollup_qty",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def rollup_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@REG.add(
    "cube_qty",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, count(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )


@REG.add(
    "grouping_sets_qty",
    """
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
    """,
)
def grouping_sets_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
        FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        """
    )


@REG.add(
    "pivot_linestatus",
    """
    SELECT l_returnflag,
           sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END) AS qty_O,
           sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END) AS qty_F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-values job)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum("l_quantity"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@REG.add(
    "case_bucketing",
    f"""
    SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
                WHEN o_totalprice < 150000 THEN 'medium'
                ELSE 'large' END                      AS bucket,
           count(*)                                   AS n,
           {sql_dsum("o_totalprice")}                 AS total
    FROM orders GROUP BY 1
    """,
)
def case_bucketing(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 50000, "small")
        .when(F.col("o_totalprice") < 150000, "medium")
        .otherwise("large")
    )
    return o.groupBy(bucket.alias("bucket")).agg(
        F.count("*").alias("n"), dsum("o_totalprice").alias("total")
    )


# --------------------------------------------------------------------------
# joins
# --------------------------------------------------------------------------


@REG.add(
    "top_unshipped_orders",
    f"""
    SELECT o.o_orderkey, o.o_orderdate,
           {sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
                    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate  > TIMESTAMP '1998-07-01'
    GROUP BY o.o_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o_orderkey LIMIT 10
    """,
)
def top_unshipped_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: broadcast the filtered customer dim into orders,
    shuffle-join lineitem on orderkey, agg, top-10 (TakeOrdered, no global
    sort). Deterministic tie-break on o_orderkey."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-07-01").cast("timestamp")
    )
    l = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-07-01").cast("timestamp")
    )
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(dsum(_revenue()).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )


@REG.add(
    "supplier_volume_by_nation",
    f"""
    SELECT r.r_name, n.n_name,
           {sql_dsum("l.l_extendedprice * (1.0 - l.l_discount)")} AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    JOIN nation n   ON s.s_nationkey = n.n_nationkey
                    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'AMERICA')
    GROUP BY r.r_name, n.n_name
    """,
)
def supplier_volume_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake dim chain. All three dims broadcast —
    the 100 TB fact table never shuffles for enrichment."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name").isin("ASIA", "AMERICA"))
    return (
        l.join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(dsum(_revenue()).alias("revenue"), F.count("*").alias("n_items"))
    )


@REG.add(
    "priority_with_returns",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
)
def priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS -> left-semi join (TPC-H Q4 shape)."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@REG.add(
    "customers_without_big_orders",
    """
    SELECT c_mktsegment, count(*) AS n_customers
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000)
    GROUP BY c_mktsegment
    """,
)
def customers_without_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_customers"))
    )


@REG.add(
    "customer_order_counts",
    """
    SELECT c.c_custkey, c.c_mktsegment, count(o.o_orderkey) AS n_orders
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_mktsegment
    """,
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with null-tolerant count (0 for order-less customers)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# window functions
# --------------------------------------------------------------------------


@REG.add(
    "topk_per_customer_agg",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def topk_per_customer_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group WITHOUT a window sort: collect each customer's
    orders into an array inside the hash aggregate, sort the (small)
    per-key array, keep k, re-explode with the rank. Value-identical to
    the row_number version (same oracle). Against the window form this
    trades the full partition SORT for a per-group array sort bounded by
    group size — right when groups are small relative to partitions. For
    huge groups the full-scale variant replaces collect_list with a UDAF
    whose partial state is capped at k, making the map side shrink every
    group to k before the shuffle; collect_list alone does not truncate
    its partials."""
    o = load_table(spark, sf_dir, "orders")
    packed = o.groupBy("o_custkey").agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct((-F.col("o_totalprice")).alias("neg_price"), "o_orderkey"))
            ),
            1,
            3,
        ).alias("top")
    )
    return packed.select(
        "o_custkey", F.posexplode("top").alias("pos", "t")
    ).select(
        "o_custkey",
        F.col("t.o_orderkey").alias("o_orderkey"),
        (-F.col("t.neg_price")).alias("o_totalprice"),
        (F.col("pos") + 1).alias("rn"),
    )


@REG.add(
    "top_orders_per_customer",
    """
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders)
    WHERE rn <= 3
    """,
)
def top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: rank inside the partition, never a global sort.
    At scale this is one shuffle on the partition key."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
    )


@REG.add(
    "running_quantity_by_supplier",
    """
    SELECT l_suppkey, l_orderkey, l_linenumber, l_quantity,
           sum(l_quantity) OVER (PARTITION BY l_suppkey
                                 ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS running_qty
    FROM lineitem
    """,
)
def running_quantity_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-frame window (ROWS UNBOUNDED PRECEDING..CURRENT). The sort
    key ends with l_quantity because (l_orderkey, l_linenumber) is NOT
    unique in the synthetic data: rows still tied after the full key have
    equal quantities, so every tie order yields the same output multiset —
    without that column the running sum is nondeterministic across runs."""
    l = load_table(spark, sf_dir, "lineitem")
    w = (
        W.partitionBy("l_suppkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return l.select(
        "l_suppkey", "l_orderkey", "l_linenumber", "l_quantity",
        F.sum("l_quantity").over(w).alias("running_qty"),
    )


@REG.add(
    "order_gap_days",
    """
    SELECT o_custkey, o_orderkey,
           date_diff('day',
                     CAST(lag(o_orderdate) OVER (PARTITION BY o_custkey
                                                 ORDER BY o_orderdate, o_orderkey) AS DATE),
                     CAST(o_orderdate AS DATE)) AS gap_days
    FROM orders
    """,
)
def order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() + date arithmetic: days since the customer's previous order."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag(F.col("o_orderdate")).over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.datediff(F.col("o_orderdate").cast("date"), prev.cast("date")).alias("gap_days"),
    )


# --------------------------------------------------------------------------
# sorts / limits / set ops
# --------------------------------------------------------------------------


@REG.add(
    "top_orders_global",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
    """,
)
def top_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — each partition
    keeps k rows, driver merges k — O(k) memory at any scale."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


@REG.add(
    "window_rank_variants",
    """
    SELECT o_orderkey, o_orderpriority,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           percent_rank() OVER w AS prnk,
           ntile(4)       OVER w AS quartile,
           cume_dist()    OVER w AS cdist,
           lead(o_orderkey, 1, -1) OVER w AS next_key,
           first_value(o_orderkey) OVER w AS cheapest_key
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_variants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ranking-window family (rank / dense_rank / percent_rank / ntile /
    cume_dist / lead / first_value) in one pass: a single shuffle on the
    partition key serves all seven functions. The order key is tie-broken
    by o_orderkey so every function is deterministic.

    Scale note: o_orderpriority has 5 distinct values, so window
    parallelism is capped at 5 tasks AT ANY DATA SIZE — inherent to the
    query (the partition key IS the spec: ranks are global within a
    priority). At 100 TB you either accept the 5 sorted spills or
    pre-aggregate to the granularity the ranks are consumed at; a
    low-cardinality partition key is a property of the question, not a
    plan defect."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_orderpriority",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.percent_rank().over(w).alias("prnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.cume_dist().over(w).alias("cdist"),
        F.lead("o_orderkey", 1, -1).over(w).alias("next_key"),
        F.first_value("o_orderkey").over(w).alias("cheapest_key"),
    )


@REG.add("approx_sketches")  # no oracle: sketch outputs are algorithm-specific
def approx_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch aggregates — the 100 TB workhorses where exact answers cost a
    full shuffle: HyperLogLog++ distinct counts and quantile sketches,
    grouped per return flag. Both are partial-aggregatable, so the sketch
    (not the data) crosses the wire. No DuckDB oracle — sketch estimates
    are algorithm-specific (driver records the rows-only check); the pytest
    asserts the estimates land within the documented error bounds of the
    exact answers. Quantiles surface as scalar p50/p90/p99 columns (not one
    array column) so rows-only canonicalizers can sort the frame. Each row
    also carries the EXACT count(DISTINCT) companions (exact_parts /
    exact_supps) so sketch drift is visible in the recorded row itself —
    the exact columns cost one expand-distinct pass at test scale and
    would be dropped (or sampled) in the 100 TB deployment where the
    sketch exists precisely to avoid them."""
    l = load_table(spark, sf_dir, "lineitem")
    q = l.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
        F.approx_count_distinct("l_suppkey", rsd=0.02).alias("approx_supps"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
        F.percentile_approx("l_extendedprice", [0.5, 0.9, 0.99], 10000).alias(
            "_pq"
        ),
    )
    return q.select(
        "l_returnflag",
        "approx_parts",
        "approx_supps",
        "exact_parts",
        "exact_supps",
        F.col("_pq")[0].alias("p50"),
        F.col("_pq")[1].alias("p90"),
        F.col("_pq")[2].alias("p99"),
    )


@REG.add(
    "approx_sketches_exact",
    """
    WITH ranked AS (
      SELECT l_returnflag, l_extendedprice,
             row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rn,
             count(*)    OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem),
    pct AS (
      SELECT l_returnflag,
             min(CASE WHEN rn >= ceil(0.5 * n)  THEN l_extendedprice END) AS p50,
             min(CASE WHEN rn >= ceil(0.9 * n)  THEN l_extendedprice END) AS p90,
             min(CASE WHEN rn >= ceil(0.99 * n) THEN l_extendedprice END) AS p99
      FROM ranked GROUP BY l_returnflag),
    ex AS (
      SELECT l_returnflag,
             CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
             CAST(count(DISTINCT l_suppkey) AS BIGINT) AS exact_supps
      FROM lineitem GROUP BY l_returnflag)
    SELECT ex.l_returnflag, exact_parts, exact_supps, p50, p90, p99
    FROM ex JOIN pct USING (l_returnflag)
    """,
)
def approx_sketches_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fully-oracle-checkable twin of ``approx_sketches`` (round-3
    verdict #3): EXACT distinct counts and EXACT discrete percentiles per
    return flag, so the driver records a hash-green row for this family
    while the sketch original keeps its rows-only check + error-bound
    pytest. Percentiles are DISCRETE (smallest value whose rank reaches
    ceil(p*n)) via an explicit row_number formulation — the identical SQL
    runs on both engines, dodging the subtly-different interpolation /
    index conventions of native percentile_cont/quantile fns. Tie order
    among equal prices can't change the selected VALUE.

    Scale note: the per-flag rank needs a per-flag sort with only 3
    distinct flags — parallelism capped at 3 tasks, the inherent cost of
    exact quantiles on a low-cardinality partition key and exactly why the
    sketch original (mergeable, partial-aggregatable) is the 100 TB path."""
    l = load_table(spark, sf_dir, "lineitem")
    wo = W.partitionBy("l_returnflag").orderBy("l_extendedprice")
    wn = W.partitionBy("l_returnflag")
    ranked = (
        l.select("l_returnflag", "l_extendedprice")
        .withColumn("rn", F.row_number().over(wo))
        .withColumn("n", F.count("*").over(wn))
    )

    def pick(p: float) -> Column:
        at = F.ceil(F.lit(p) * F.col("n"))
        return F.min(F.when(F.col("rn") >= at, F.col("l_extendedprice")))

    pct = ranked.groupBy("l_returnflag").agg(
        pick(0.5).alias("p50"), pick(0.9).alias("p90"), pick(0.99).alias("p99")
    )
    ex = l.groupBy("l_returnflag").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_suppkey").alias("exact_supps"),
    )
    return ex.join(pct, "l_returnflag")


def salted_join(
    fact: DataFrame, dim: DataFrame, key: str, n_salts: int = 8, how: str = "inner"
) -> DataFrame:
    """Skew-mitigated equi-join: the fact side gets a deterministic per-row
    salt (hash of the whole row, mod n_salts) and the smaller side is
    replicated once per salt value, so one hot key's rows spread across
    n_salts reducers instead of one. Value-identical to the plain join.
    AQE's skew-join split handles most cases at runtime; explicit salting
    is the escape hatch when one key is so hot a single split still spills,
    or when the skewed stage is a sort/agg AQE can't re-plan."""
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(n_salts))
    fact_s = fact.withColumn("_salt", salt)
    dim_s = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return fact_s.join(dim_s, [key, "_salt"], how).drop("_salt")


@REG.add(
    "skew_salted_join",
    f"""
    SELECT o_orderpriority,
           {sql_dsum(_REV)} AS revenue,
           count(*)         AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join executed through the salting path (8 salts) and
    aggregated — the oracle is the PLAIN join, proving salting changes the
    physical distribution and nothing else."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    joined = salted_join(l, o, "l_orderkey", n_salts=8)
    return joined.groupBy("o_orderpriority").agg(
        dsum(_revenue()).alias("revenue"), F.count("*").alias("n_items")
    )


@REG.add(
    "idle_rich_customers",
    f"""
    SELECT c_nationkey, count(*) AS n_cust, {sql_dsum("c_acctbal")} AS total_bal
    FROM customer c
    WHERE c_acctbal > (
            SELECT {sql_dsum("c_acctbal")} / count(*)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 250000.0)
    GROUP BY c_nationkey
    """,
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar subquery (global average balance) feeding a
    filter, plus an anti join (customers with no large order). The scalar side
    is a 1-row aggregate broadcast into the predicate; the anti join
    shuffles on custkey. The average is dsum/count so the threshold is
    bit-identical across engines."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg((dsum("c_acctbal") / F.count("*")).alias("avg_bal"))
    )
    return (
        c.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_totalprice") > 250000.0),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("n_cust"), dsum("c_acctbal").alias("total_bal"))
    )


@REG.add(
    "top_revenue_suppliers",
    f"""
    WITH rev AS (
      SELECT l_suppkey, {sql_dsum(_REV)} AS total_revenue
      FROM lineitem GROUP BY l_suppkey)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN rev ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
    """,
)
def top_revenue_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate view + scalar MAX subquery over it,
    keeping every supplier tied at the maximum. The revenue view computes
    once and feeds both the max and the final filter (Spark reuses the
    exchange); the max is a 1-row broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = l.groupBy(F.col("l_suppkey")).agg(dsum(_revenue()).alias("total_revenue"))
    mx = rev.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        s.join(rev, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@REG.add(
    "promo_revenue_ratio",
    f"""
    SELECT 100.0 * promo / total AS promo_pct, promo, total
    FROM (
      SELECT {sql_dsum(f"CASE WHEN p_type LIKE 'PROMO%' THEN {_REV} ELSE 0.0 END")} AS promo,
             {sql_dsum(_REV)} AS total
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-09-01'
        AND l_shipdate < TIMESTAMP '1997-10-01')
    """,
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: fact-dim join + conditional aggregation ratio. The
    part side broadcasts (dim), the month filter pushes into the lineitem
    scan, and both the conditional and total revenue come out of ONE agg
    pass — no second scan for the denominator."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    )
    agg = j.agg(
        dsum(
            F.when(F.col("p_type").like("PROMO%"), _revenue()).otherwise(F.lit(0.0))
        ).alias("promo"),
        dsum(_revenue()).alias("total"),
    )
    return agg.select(
        (F.lit(100.0) * F.col("promo") / F.col("total")).alias("promo_pct"),
        "promo",
        "total",
    )


@REG.add(
    "order_priority_by_quarter",
    """
    SELECT CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter, o_orderpriority,
           count(*) AS n_orders,
           CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
    GROUP BY date_trunc('quarter', o_orderdate), o_orderpriority
    """,
)
def order_priority_by_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 flavor: time-bucketed (quarter) priority counts with a
    conditional tally — date_trunc bucketing plus CASE aggregation in one
    partial-aggregatable pass."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        .groupBy(
            F.date_trunc("quarter", "o_orderdate").alias("quarter"), "o_orderpriority"
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias(
                "n_finished"
            ),
        )
    )


def _building_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select(F.col("c_custkey").alias("custkey"))
    )


def _frequent_custkeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= 5)
        .select("custkey")
    )


_SET_A = "SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'"
_SET_B = "SELECT o_custkey AS custkey FROM orders GROUP BY o_custkey HAVING count(*) >= 5"


@REG.add("set_intersect", f"({_SET_A}) INTERSECT ({_SET_B})")
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building_custkeys(spark, sf_dir).intersect(_frequent_custkeys(spark, sf_dir))


@REG.add("set_except", f"({_SET_A}) EXCEPT ({_SET_B})")
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    # subtract() IS SQL EXCEPT (distinct): a value on both sides never
    # survives. exceptAll().distinct() would wrongly keep a value whose
    # left multiplicity exceeds its right.
    return _building_custkeys(spark, sf_dir).subtract(_frequent_custkeys(spark, sf_dir))


@REG.add("set_union", f"({_SET_A}) UNION ({_SET_B})")
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _building_custkeys(spark, sf_dir).union(_frequent_custkeys(spark, sf_dir)).distinct()


@REG.add(
    "price_histogram",
    """
    SELECT CAST(floor(l_extendedprice / 10000.0) AS BIGINT) AS bucket,
           count(*) AS n,
           CAST(min(l_extendedprice) AS DOUBLE) AS lo,
           CAST(max(l_extendedprice) AS DOUBLE) AS hi
    FROM lineitem GROUP BY 1
    """,
)
def price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram (10k-wide buckets) via floor division + hash
    agg — the one-pass distribution profile (no sort, fully
    partial-aggregatable). min/max per bucket surface as DOUBLE on both
    engines: min/max never create new values, so the doubles are identical
    bit patterns and the string canonicalization can't diverge the way
    DECIMAL renderings (trailing zeros) can."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.select(
            F.floor(F.col("l_extendedprice") / 10000.0).alias("bucket"),
            "l_extendedprice",
        )
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.min("l_extendedprice").cast("double").alias("lo"),
            F.max("l_extendedprice").cast("double").alias("hi"),
        )
    )


@REG.add(
    "deterministic_sample",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    WHERE substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 1) = '0'
    """,
)
def deterministic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~1/16 sample: hash the key, keep one hex-prefix class.
    Unlike rand()-based TABLESAMPLE this is stable across engines, runs,
    and partitionings — the property a 100 TB eval-split or debug-slice
    actually needs (membership is a pure function of the key, so the same
    rows appear in every downstream job that repeats the predicate)."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.md5(F.col("o_orderkey").cast("string")).substr(1, 1) == "0"
    ).select("o_orderkey", "o_custkey", "o_totalprice")


@REG.add(
    "price_outliers_iqr",
    f"""
    WITH r AS (
      SELECT l_orderkey, {sql_dsum("l_extendedprice * (1.0 - l_discount)")} AS order_rev
      FROM lineitem GROUP BY l_orderkey),
    q AS (
      SELECT quantile_cont(order_rev, 0.25) AS q1,
             quantile_cont(order_rev, 0.75) AS q3
      FROM r)
    SELECT count(*)                                  AS n_outliers,
           CAST(min(r.order_rev) AS DOUBLE)          AS min_outlier,
           CAST(max(r.order_rev) AS DOUBLE)          AS max_outlier
    FROM r CROSS JOIN q
    WHERE r.order_rev > q.q3 + 1.5 * (q.q3 - q.q1)
       OR r.order_rev < q.q1 - 1.5 * (q.q3 - q.q1)
    """,
)
def price_outliers_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IQR outlier detection on a DERIVED distribution: per-order revenue
    (sum over the order's line items — right-skewed because item counts
    vary) against the classic [q1 - 1.5*IQR, q3 + 1.5*IQR] fences. Three
    stages in one plan: partial-aggregatable revenue rollup, a one-row
    exact-quantile frame broadcast back, and the fence filter. Per-order
    revenue goes through the decimal sum so the quantile inputs are
    bit-identical across engines. Classic data-cleaning gate before
    training-data export."""
    l = load_table(spark, sf_dir, "lineitem")
    r = l.groupBy("l_orderkey").agg(dsum(_revenue()).alias("order_rev"))
    q = r.agg(
        F.percentile("order_rev", 0.25).alias("q1"),
        F.percentile("order_rev", 0.75).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        r.join(F.broadcast(q))
        .filter(
            (F.col("order_rev") > F.col("q3") + 1.5 * iqr)
            | (F.col("order_rev") < F.col("q1") - 1.5 * iqr)
        )
        .agg(
            F.count("*").alias("n_outliers"),
            F.min("order_rev").cast("double").alias("min_outlier"),
            F.max("order_rev").cast("double").alias("max_outlier"),
        )
    )


@REG.add(
    "local_supplier_revenue",
    f"""
    SELECT n_name, {sql_dsum(_REV)} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)
def local_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: six-table join where the supplier must be in the
    customer's own nation (the extra c_nationkey = s_nationkey equi-term).
    supplier/nation/region broadcast; the only repartition-shuffles are
    the orders-lineitem fact join — Catalyst orders the join tree, AQE
    re-plans it at runtime. The region filter prunes before any join."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(s),
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(dsum(_revenue()).alias("revenue"))
    )


@REG.add(
    "returned_item_customers",
    f"""
    SELECT * FROM (
      SELECT c_custkey, c_name, {sql_dsum(_REV)} AS revenue, c_acctbal, n_name
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN nation   ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1996-10-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY c_custkey, c_name, c_acctbal, n_name)
    ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue last quarter — fact
    joins filtered on the return flag, grouped per customer, global top-20
    via TakeOrdered (deterministic revenue + custkey tie-break)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"))
        .join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(_revenue()).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@REG.add(
    "customer_churn_full_outer",
    """
    SELECT coalesce(a.c, b.c) AS c_custkey,
           coalesce(a.n, 0)   AS n_1996,
           coalesce(b.n, 0)   AS n_1997,
           CASE WHEN a.c IS NULL THEN 'new'
                WHEN b.c IS NULL THEN 'churned'
                ELSE 'retained' END AS status
    FROM (SELECT o_custkey AS c, count(*) AS n FROM orders
          WHERE o_orderdate >= TIMESTAMP '1996-01-01'
            AND o_orderdate <  TIMESTAMP '1997-01-01' GROUP BY o_custkey) a
    FULL OUTER JOIN
         (SELECT o_custkey AS c, count(*) AS n FROM orders
          WHERE o_orderdate >= TIMESTAMP '1997-01-01'
            AND o_orderdate <  TIMESTAMP '1998-01-01' GROUP BY o_custkey) b
      ON a.c = b.c
    """,
)
def customer_churn_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: year-over-year customer activity reconciliation —
    rows survive from either side, null sides classify churned/new/
    retained. Both inputs pre-aggregate before the join, so the outer join
    runs on one row per customer per year, not raw orders."""
    o = load_table(spark, sf_dir, "orders")

    def year(y: int) -> DataFrame:
        return (
            o.filter(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01").cast("timestamp"))
            )
            .groupBy(F.col("o_custkey").alias("c"))
            .agg(F.count("*").alias("n"))
        )

    a, b = year(1996).alias("a"), year(1997).alias("b")
    return a.join(b, F.col("a.c") == F.col("b.c"), "full_outer").select(
        F.coalesce(F.col("a.c"), F.col("b.c")).alias("c_custkey"),
        F.coalesce(F.col("a.n"), F.lit(0)).alias("n_1996"),
        F.coalesce(F.col("b.n"), F.lit(0)).alias("n_1997"),
        F.when(F.col("a.c").isNull(), "new")
        .when(F.col("b.c").isNull(), "churned")
        .otherwise("retained")
        .alias("status"),
    )


@REG.add(
    "small_qty_part_revenue",
    f"""
    WITH lf AS (
      SELECT l_partkey, l_quantity, l_extendedprice
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE p_brand = 'Brand#23'),
    th AS (
      SELECT l_partkey, 0.2 * (sum(l_quantity) / count(*)) AS qty_thresh
      FROM lf GROUP BY l_partkey)
    SELECT {sql_dsum("l_extendedprice")} / 7.0 AS avg_yearly
    FROM lf JOIN th USING (l_partkey)
    WHERE l_quantity < qty_thresh
    """,
)
def small_qty_part_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue locked in unusually-small orders of one
    brand's parts — a correlated-average subquery decorrelated into a
    per-part aggregate joined back to the same filtered fact. The brand
    filter broadcasts into the scan FIRST, so both the threshold agg and
    the probe side run on ~1/25th of lineitem; the self-join shuffles on
    l_partkey only. Quantities are integer-valued doubles, so the
    threshold (0.2 * exact-sum / count) is engine-deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    lf = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey")).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    th = lf.groupBy("l_partkey").agg(
        (F.lit(0.2) * (F.sum("l_quantity") / F.count("*"))).alias("qty_thresh")
    )
    return (
        lf.join(th, "l_partkey")
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@REG.add(
    "large_volume_customers",
    """
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           sum(l_quantity) AS total_qty
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 300)
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers behind the biggest orders — a HAVING
    subquery turned into an aggregate + LEFT SEMI join that prunes
    lineitem to the ~0.3% of orders over the quantity threshold BEFORE the
    customer join, so the expensive three-way join runs on the tiny
    survivor set. Global top-100 is TakeOrdered with an o_orderkey
    tie-break."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey, "left_semi")
        .join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
    )


@REG.add(
    "bracket_revenue",
    f"""
    SELECT {sql_dsum(_REV)} AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 10
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 20
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 30
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def bracket_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive bracket predicate spanning both join
    sides. The OR cannot be pushed whole, but Catalyst derives a per-side
    disjunction for EACH scan (the OR of the p_brand/p_size conjuncts for
    part, the OR of the l_quantity ranges for lineitem — visible as
    Or(...) in PushedFilters, pinned by tests/test_plans.py); the full
    bracket then re-evaluates after the broadcast join of the pruned part
    side."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
    bracket = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 10)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 20)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(bracket).agg(dsum(_revenue()).alias("revenue"))


@REG.add(
    "nation_market_share",
    f"""
    SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {sql_dsum(f"CASE WHEN n2.n_name = 'NATION_7' THEN {_REV} ELSE 0.0 END")}
             / {sql_dsum(_REV)} AS mkt_share
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation n1 ON c_nationkey = n1.n_nationkey
    JOIN region   ON n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation n2 ON s_nationkey = n2.n_nationkey
    GROUP BY year(o_orderdate)
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one supplier nation's share of the revenue sold
    into a customer region, per year — a six-table star where nation twice
    plays different roles (customer side filters to the region, supplier
    side labels the numerator). All four dimensions broadcast; the only
    shuffles are the two fact joins and the final year agg. The share is
    a ratio of two decimal-exact sums, so it is engine-deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.alias("n1")
    n2 = n.select(
        F.col("n_nationkey").alias("n2_nationkey"), F.col("n_name").alias("n2_name")
    )
    numer = F.when(F.col("n2_name") == "NATION_7", _revenue()).otherwise(F.lit(0.0))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_nationkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(numer) / dsum(_revenue())).alias("mkt_share"))
    )


@REG.add(
    "product_profit_by_nation_year",
    f"""
    SELECT n_name AS nation, CAST(year(o_orderdate) AS INTEGER) AS o_year,
           {sql_dsum(f"{_REV} - 0.8 * p_retailprice * l_quantity")} AS profit
    FROM lineitem
    JOIN part     ON p_partkey = l_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN orders   ON l_orderkey = o_orderkey
    WHERE p_name LIKE '%gear%'
    GROUP BY n_name, year(o_orderdate)
    """,
)
def product_profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on one product line by supplier nation and
    year. The LIKE filter prunes part before its broadcast join (TPC-H has
    ps_supplycost here; this schema has no partsupp, so cost is the
    documented 0.8 * p_retailprice proxy — same plan shape, same join
    tree). Two fact joins shuffle; part/supplier/nation broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders")
    profit = _revenue() - F.lit(0.8) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(profit).alias("profit"))
    )


@REG.add(
    "late_shipment_suppliers",
    """
    WITH late AS (
      SELECT DISTINCT l_orderkey, l_suppkey
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY),
    multi AS (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
      HAVING count(DISTINCT l_suppkey) >= 2),
    solo AS (
      SELECT l_orderkey FROM late GROUP BY l_orderkey HAVING count(*) = 1)
    SELECT s_name, count(*) AS numwait
    FROM late
    JOIN multi USING (l_orderkey)
    JOIN solo  USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    GROUP BY s_name
    ORDER BY numwait DESC, s_name LIMIT 20
    """,
)
def late_shipment_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    multi-supplier order. (This schema has no l_commitdate; "late" is the
    documented ship > order-date + 60 days.)

    Round-16 rework of the derived sets (guide §2.4/§1.2 — the previous
    shape derived ``late`` TWICE because Spark shares no subplans: once
    as the main branch and once inside the ``solo`` semi-join source, so
    the lineitem⋈orders join and its distinct ran double):

    - ``solo`` now carries the winning suppkey itself: a count==1 group
      has exactly one (order, supplier) row, so max(suppkey) IS that
      supplier — one hash agg over ``late`` replaces the second
      derivation + the count + a semi join back against ``late``.
    - ``multi`` (>= 2 distinct suppliers on the order) is min(suppkey)
      != max(suppkey) — partial-aggregatable min/max instead of the
      two-phase distinct-count expansion.

    Measured sf0.1: 3.7 s -> 1.5 s warm, value-identical (exceptAll both
    ways). The semi join still shuffles only orderkeys; supplier stays a
    broadcast dim; the final top-20 is a TakeOrdered."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    late = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    solo = (
        late.groupBy("l_orderkey")
        .agg(F.count("*").alias("nl"), F.max("l_suppkey").alias("l_suppkey"))
        .filter(F.col("nl") == 1)
        .select("l_orderkey", "l_suppkey")
    )
    multi = (
        l.groupBy("l_orderkey")
        .agg((F.min("l_suppkey") != F.max("l_suppkey")).alias("is_multi"))
        .filter(F.col("is_multi"))
        .select("l_orderkey")
    )
    return (
        solo.join(multi, "l_orderkey", "left_semi")
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@REG.add(
    "min_cost_supplier",
    f"""
    WITH cost AS (
      SELECT l_partkey, l_suppkey,
             {sql_dsum('l_extendedprice')} / sum(l_quantity) AS unit_price
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    eu AS (
      SELECT s_suppkey, s_name FROM supplier
      JOIN nation ON n_nationkey = s_nationkey
      JOIN region ON r_regionkey = n_regionkey
      WHERE r_name = 'EUROPE'),
    best AS (
      SELECT c.l_partkey, min(c.unit_price) AS min_price
      FROM cost c JOIN eu ON eu.s_suppkey = c.l_suppkey
      GROUP BY c.l_partkey)
    SELECT p_partkey, p_brand, s_name, c.unit_price AS unit_price
    FROM cost c
    JOIN eu   ON eu.s_suppkey = c.l_suppkey
    JOIN best ON best.l_partkey = c.l_partkey AND c.unit_price = best.min_price
    JOIN part ON p_partkey = c.l_partkey
    WHERE p_size <= 10
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the correlated MIN subquery — for every small part,
    the EUROPE supplier offering the minimum historical unit price. (No
    partsupp table in this schema; supply cost is the observed mean
    l_extendedprice/l_quantity per (part, supplier) from lineitem.)

    The correlated MIN decorrelates to a WINDOW-min over the per-key
    aggregate (min(unit_price) OVER (PARTITION BY part)) + filter — ONE
    lineitem pass, one agg shuffle, one window shuffle on partkey. The
    agg+self-join alternative reads twice: Spark plans the two branches
    as independent subtrees (no ReusedExchange across the join), so the
    fact scan and (part, supplier) aggregation both run twice — verified
    on the executed plan before switching to the window form (bench
    sf0.1: 2.86 s -> window form). unit_price is the QUANTITY-WEIGHTED
    mean, sum(price)/sum(qty): both sums are order-independent (decimal
    convention / integer-valued doubles), so the one double division —
    and the equality compare against the window MIN — is bit-identical
    on both engines. (A per-row price/qty inside the decimal sum is NOT:
    the division lands doubles on 6-dp rounding ties where Spark and
    DuckDB disagree — observed 1 ulp-of-decimal drift at sf0.01.)"""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    eu = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r.filter(F.col("r_name") == "EUROPE"), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name")
    )
    cost = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg((dsum("l_extendedprice") / F.sum("l_quantity")).alias("unit_price"))
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
    )
    wmin = F.min("unit_price").over(W.partitionBy("l_partkey"))
    return (
        cost.withColumn("min_price", wmin)
        .filter(F.col("unit_price") == F.col("min_price"))
        .join(F.broadcast(p.filter(F.col("p_size") <= 10)), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_partkey", "p_brand", "s_name", "unit_price")
    )


@REG.add(
    "nation_pair_trade",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(year(l_shipdate) AS INTEGER) AS l_year,
           {sql_dsum(_REV)} AS revenue
    FROM lineitem
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey = o_custkey
    JOIN nation sn ON sn.n_nationkey = s_nationkey
    JOIN nation cn ON cn.n_nationkey = c_nationkey
    WHERE (sn.n_name = 'NATION_3' AND cn.n_name = 'NATION_7')
       OR (sn.n_name = 'NATION_7' AND cn.n_name = 'NATION_3')
    GROUP BY sn.n_name, cn.n_name, year(l_shipdate)
    """,
)
def nation_pair_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year
    — the classic two-branch nation-pair filter over a lineitem-supplier-
    orders-customer join. Both nation dims broadcast; the only fact-fact
    shuffle is lineitem-orders on orderkey. The disjunctive pair filter
    runs AFTER the broadcast joins (it needs both nation names), so at
    scale you'd pre-filter supplier/customer to the two nations first —
    which is exactly what the broadcast build sides here do."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    pair = F.col("supp_nation").isin("NATION_3", "NATION_7") & F.col(
        "cust_nation"
    ).isin("NATION_3", "NATION_7") & (F.col("supp_nation") != F.col("cust_nation"))
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    ).filter(F.col("supp_nation").isin("NATION_3", "NATION_7"))
    cn = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    ).filter(F.col("cust_nation").isin("NATION_3", "NATION_7"))
    return (
        l.join(F.broadcast(sn), l.l_suppkey == sn.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(cn), o.o_custkey == cn.c_custkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(dsum(F.expr(_REV)).alias("revenue"))
    )


@REG.add(
    "part_value_concentration",
    f"""
    WITH pv AS (
      SELECT l_partkey, {sql_dsum(_REV)} AS value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY l_partkey)
    SELECT l_partkey, value
    FROM pv
    WHERE value > (SELECT 2.5 * avg(value) FROM pv)
    """,
)
def part_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts holding an outsized share of one nation's
    traded value — a grouped aggregate HAVING-compared against a SCALAR
    SUBQUERY over the same aggregate. The threshold is relative (2.5x the
    mean per-part value) rather than Q11's fixed fraction of the total
    because TPC-H scales that fraction by SF — a fixed 0.002 selects 26
    parts at sf0.01 and zero at sf0.1; the relative form is scale-free.
    The scalar is an UNPARTITIONED window-avg over the per-part frame —
    deliberate single-partition execution over a dimension-sized input
    (one row per part, the same intended shape as pack_sequences' shard
    offsets): the alternative agg-plus-crossjoin plans pv as two
    independent subtrees and scans the fact table twice (no
    ReusedExchange — the min_cost_supplier lesson, pinned by
    test_plans). Both compare operands come off the same decimal-sum
    path, so the compare is engine-deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supp5 = s.join(
        F.broadcast(n.filter(F.col("n_name") == "NATION_5")),
        s.s_nationkey == n.n_nationkey,
    ).select("s_suppkey")
    pv = (
        l.join(F.broadcast(supp5), l.l_suppkey == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(dsum(F.expr(_REV)).alias("value"))
    )
    threshold = F.lit(2.5) * F.avg("value").over(W.partitionBy())
    return (
        pv.withColumn("threshold", threshold)
        .filter(F.col("value") > F.col("threshold"))
        .select("l_partkey", "value")
    )


@REG.add(
    "shipping_delay_priority",
    """
    SELECT CAST(least(floor(date_diff('day', o_orderdate, l_shipdate) / 30.0), 3) AS BIGINT)
             AS delay_bucket,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS high_priority,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
             AS low_priority
    FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    WHERE l_shipdate >= o_orderdate
    GROUP BY 1
    """,
)
def shipping_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional two-way priority counts per shipping
    category — CASE-pivot aggregation over a fact-fact join. (No
    l_shipmode in this schema; the category is the order-to-ship delay in
    30-day buckets, capped at 3+.) The CASE counts are
    partial-aggregatable, so the shuffle carries 4 rows per mapper."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    bucket = F.least(
        F.floor(F.datediff("l_shipdate", "o_orderdate") / 30.0), F.lit(3)
    ).cast("long")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .groupBy(bucket.alias("delay_bucket"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_priority"),
            F.sum(F.when(~hi, 1).otherwise(0)).cast("long").alias("low_priority"),
        )
    )


@REG.add(
    "part_supplier_variety",
    """
    SELECT p_brand, p_type, CAST(p_size // 10 AS BIGINT) AS size_bucket,
           CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size // 10
    """,
)
def part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers stock each part
    family, EXCLUDING a blacklist via NOT IN — the anti-join pattern.
    (The complaint-supplier stand-in is negative account balance.) The
    blacklist is broadcast as a left-anti join (NULL-safe here because
    s_suppkey is a key column, never NULL); part is a broadcast dim; the
    one shuffle is the distinct-count agg on the family key."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        l.join(F.broadcast(bad), l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy(
            "p_brand",
            "p_type",
            (F.col("p_size") / 10).cast("long").alias("size_bucket"),
        )
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@REG.add(
    "dominant_part_suppliers",
    """
    WITH psq AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty
      FROM lineitem GROUP BY l_partkey, l_suppkey),
    tot AS (
      SELECT l_partkey, avg(qty) AS avg_qty FROM psq GROUP BY l_partkey)
    SELECT DISTINCT s_name, n_name
    FROM psq
    JOIN tot USING (l_partkey)
    JOIN supplier ON s_suppkey = l_suppkey
    JOIN nation ON n_nationkey = s_nationkey
    WHERE psq.qty > 2.5 * tot.avg_qty
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers crossing a CORRELATED per-part threshold
    — shipping more than 2.5x the average per-supplier quantity of that
    part (Q20's availqty > 0.5 * sum(l_quantity) correlation,
    re-thresholded for this synthetic data where parts spread near-evenly
    across ~80 suppliers and no one holds a majority share). Decorrelated
    into two stacked aggregates on the same key — the second
    re-aggregates the first's (small) output, so the fact table is
    scanned and shuffled exactly once — then the share filter and
    DISTINCT suppliers decorated with nation. Quantity sums are
    integer-valued doubles (< 2^53, exact on both engines) and avg/2.5x
    are single identical double ops, so the compare is deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    psq = l.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("qty"))
    tot = psq.groupBy("l_partkey").agg(F.avg("qty").alias("avg_qty"))
    return (
        psq.join(tot, "l_partkey")
        .filter(F.col("qty") > 2.5 * F.col("avg_qty"))
        .join(F.broadcast(s), psq.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select("s_name", "n_name")
        .distinct()
    )


@REG.add(
    "dq_expectations",
    """
    SELECT 'lineitem.l_quantity_positive' AS rule,
           CAST(sum(CASE WHEN l_quantity IS NULL OR l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(count(*) AS BIGINT) AS n_checked
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_discount_in_unit_range',
           CAST(sum(CASE WHEN l_discount IS NULL OR l_discount < 0 OR l_discount > 1
                         THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem.l_returnflag_in_domain',
           CAST(sum(CASE WHEN l_returnflag NOT IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'orders.o_orderkey_unique',
           CAST(coalesce(sum(cnt - 1), 0) AS BIGINT), CAST(sum(cnt) AS BIGINT)
    FROM (SELECT count(*) AS cnt FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'orders.o_custkey_fk_customer',
           CAST(count(*) FILTER (WHERE c_custkey IS NULL) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem.l_orderkey_fk_orders',
           CAST(count(*) FILTER (WHERE o_orderkey IS NULL) AS BIGINT),
           CAST(count(*) AS BIGINT)
    FROM lineitem LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o2
      ON l_orderkey = o2.o_orderkey
    """,
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style data-quality expectation suite: per rule, how many rows
    violate it (and how many were checked). Three rule families, each in
    its scale-minimal shape: (1) row-local predicates (nulls, ranges,
    domain membership) fold into ONE conditional-sum scan per table,
    unpivoted into per-rule rows via stack() — adding a rule adds a
    column expression, not a pass; (2) key
    uniqueness re-aggregates a key-grouped count (sum(cnt-1) counts the
    extra copies); (3) referential integrity is a LEFT join probing the
    parent key, counting unmatched rows — AQE broadcasts the parent side
    when it fits, and the count is a partial-aggregatable sum either way.
    All counts are integers, so oracle parity is exact. The audit a 100 TB
    ingest runs before promoting a snapshot — the engine's answer to the
    reference's silent-skip error model (SURVEY.md §2.7: malformed rows
    vanish unreported; here every violation is counted and attributed)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    def viol(cond: Column) -> Column:
        return F.sum(F.when(cond, 1).otherwise(0)).cast("long")

    def row_rules(df: DataFrame, rules: list[tuple[str, Column]]) -> DataFrame:
        # one scan, one 1-row aggregate for ALL row-local rules of a table;
        # stack() unpivots that single row into per-rule rows (a union of
        # per-rule selects would plan the aggregate — and the scan — once
        # PER BRANCH: Catalyst does not dedupe common subtrees across union
        # arms, asserted in test_plans)
        agg = df.agg(
            F.count("*").alias("_n"),
            *[viol(cond).alias(f"_v{i}") for i, (_, cond) in enumerate(rules)],
        )
        pairs = ", ".join(f"'{name}', _v{i}" for i, (name, _) in enumerate(rules))
        return agg.select(
            F.expr(f"stack({len(rules)}, {pairs})").alias("rule", "n_violations"),
            F.col("_n").alias("n_checked"),
        )

    li_rules = row_rules(
        l,
        [
            ("lineitem.l_quantity_positive",
             F.col("l_quantity").isNull() | (F.col("l_quantity") <= 0)),
            ("lineitem.l_discount_in_unit_range",
             F.col("l_discount").isNull() | (F.col("l_discount") < 0) | (F.col("l_discount") > 1)),
            ("lineitem.l_returnflag_in_domain", ~F.col("l_returnflag").isin("A", "N", "R")),
        ],
    )
    uniq = (
        o.groupBy("o_orderkey").agg(F.count("*").alias("cnt"))
        .agg(
            F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("long").alias("n_violations"),
            F.sum("cnt").cast("long").alias("n_checked"),
        )
        .select(F.lit("orders.o_orderkey_unique").alias("rule"), "n_violations", "n_checked")
    )
    # parent keys are DEDUPED before the probe: a duplicated parent key
    # must not fan out child rows (it would inflate n_checked - caught by
    # the corrupted-world pytest)
    cust_keys = c.select("c_custkey").distinct()
    fk_cust = (
        o.join(cust_keys, o.o_custkey == cust_keys.c_custkey, "left")
        .agg(viol(F.col("c_custkey").isNull()).alias("n_violations"),
             F.count("*").cast("long").alias("n_checked"))
        .select(F.lit("orders.o_custkey_fk_customer").alias("rule"), "n_violations", "n_checked")
    )
    order_keys = o.select("o_orderkey").distinct()
    fk_ord = (
        l.select("l_orderkey")
        .join(order_keys, l.l_orderkey == order_keys.o_orderkey, "left")
        .agg(viol(F.col("o_orderkey").isNull()).alias("n_violations"),
             F.count("*").cast("long").alias("n_checked"))
        .select(F.lit("lineitem.l_orderkey_fk_orders").alias("rule"), "n_violations", "n_checked")
    )
    return li_rules.unionAll(uniq).unionAll(fk_cust).unionAll(fk_ord)


@REG.add(
    "snapshot_diff",
    """
    WITH old AS (
      SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 7 <> 0),
    new AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0 THEN o_totalprice * 1.1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders WHERE o_orderkey % 5 <> 3)
    SELECT coalesce(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'added'
                WHEN new.o_orderkey IS NULL THEN 'removed'
                ELSE 'changed' END AS change_type,
           old.o_totalprice AS old_price,
           new.o_totalprice AS new_price
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.o_totalprice <> new.o_totalprice
    """,
)
def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC-style snapshot diff: given two versions of a keyed table,
    classify every key as added / removed / changed (unchanged rows are
    dropped). The two "snapshots" derive deterministically from orders
    (old = keys not divisible by 7; new = keys not ≡3 mod 5, with keys
    divisible by 3 repriced) so both engines see identical inputs. Shape:
    one FULL OUTER hash join on the key — each side shuffles once, the
    change classification and value compare are row-local, and the
    unchanged-row filter drops the (dominant) matched-equal population
    before anything else consumes it. This is the diff a 100 TB pipeline
    runs to validate an incremental load against a full rebuild; at that
    scale the same plan applies per partition, or a table format's
    (Delta/Iceberg) snapshot metadata short-circuits the untouched
    files. Both price operands come off identical expressions, so the
    inequality compare is engine-deterministic."""
    o = load_table(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("k_old"), F.col("o_totalprice").alias("old_price")
    )
    new = o.filter(F.col("o_orderkey") % 5 != 3).select(
        F.col("o_orderkey").alias("k_new"),
        F.when(F.col("o_orderkey") % 3 == 0, F.col("o_totalprice") * 1.1)
        .otherwise(F.col("o_totalprice"))
        .alias("new_price"),
    )
    j = old.join(new, old.k_old == new.k_new, "full_outer")
    return (
        j.filter(
            F.col("k_old").isNull()
            | F.col("k_new").isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
        .select(
            F.coalesce(F.col("k_old"), F.col("k_new")).alias("o_orderkey"),
            F.when(F.col("k_old").isNull(), "added")
            .when(F.col("k_new").isNull(), "removed")
            .otherwise("changed")
            .alias("change_type"),
            "old_price",
            "new_price",
        )
    )


def quantile_bucket(df, value_col: str, n_buckets: int):
    """Skew-resistant bucket expression for ``bucketed_global_rank``:
    boundaries from an approx-quantile PRE-PASS (collected once to the
    driver, then inlined as literals), so buckets are near-balanced under
    ANY value distribution where equi-width buckets collapse onto the
    dense region. Safe for the two-branch rank: the boundaries are fixed
    literals by the time the bucket expression exists, so rank and
    histogram branches bucket identically no matter how approxQuantile's
    partition-order-dependent merge would have resolved on a re-run.
    Cost: one extra column-pruned pass (the sketch), O(n_buckets) driver
    memory."""
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = df.stat.approxQuantile(value_col, probs, 0.01)
    # strictly increasing unique boundaries; duplicates (heavy ties)
    # collapse — fewer, still-ordered buckets
    uniq = sorted(set(bounds))
    expr = F.lit(0)
    for i, b in enumerate(uniq):
        expr = F.when(F.col(value_col) > F.lit(b), i + 1).otherwise(expr)
    return expr.cast("int")


def bucketed_global_rank(df, bucket, order_cols, rank_name="rnk"):
    """Distributed exact global ranking — the shared two-pass idiom behind
    equi_depth_deciles and dataset_shuffle_order (textops). ``bucket``
    MUST be a deterministic pure function of row values ALIGNED with the
    total order (every row in bucket i sorts before every row in bucket
    i+1): a value-derived bucket recomputes identically in the rank and
    histogram branches, where repartitionByRange's sampled boundaries
    would not (see equi_depth_deciles' docstring for the hazard).
    ``quantile_bucket`` above builds a skew-resistant bucket expression
    when the value distribution would collapse equi-width buckets.
    Returns ``df`` plus ``rank_name`` (global 1-based rank, long) and
    ``__n`` (total row count, from the tiny histogram frame — no extra
    scan); callers drop the ``__``-prefixed columns they don't use."""
    part = df.withColumn("__pid", bucket)
    wp = W.partitionBy("__pid").orderBy(*order_cols)
    local = part.withColumn("__lrank", F.row_number().over(wp))
    offsets = (
        part.groupBy("__pid")
        .agg(F.count("*").alias("__cnt"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__cnt").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn("__n", F.sum("__cnt").over(W.partitionBy()))
    )
    return (
        local.join(F.broadcast(offsets.select("__pid", "__off", "__n")), "__pid")
        .withColumn(rank_name, (F.col("__lrank") + F.col("__off")).cast("long"))
    )


def bucketed_prefix_sum(df, bucket, order_cols, value_col, sum_name="cum"):
    """Distributed exact RUNNING SUM in a global order — the prefix-sum
    sibling of ``bucketed_global_rank`` (same two-pass shape, same bucket
    contract: ``bucket`` must be a deterministic pure function of row
    values aligned with the total order). Pass 1 computes each row's
    running sum of ``value_col`` LOCALLY within its bucket partition;
    pass 2 shifts every bucket by the total of all preceding buckets,
    taken from a buckets-sized aggregate frame that broadcasts (its only
    unpartitioned window runs over #buckets rows, never over data). The
    naive form — ``sum().over(Window.orderBy(...))`` with no partition —
    drags the whole input through ONE task; this shape keeps the heavy
    window partitioned and is what corpus-budget selection runs at
    100 TB. Returns ``df`` plus ``sum_name`` (running sum INCLUDING the
    current row, long); ``__``-prefixed scratch columns are dropped."""
    part = df.withColumn("__pid", bucket)
    wp = (
        W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    local = part.withColumn("__lsum", F.sum(value_col).over(wp))
    offsets = (
        part.groupBy("__pid")
        .agg(F.sum(value_col).alias("__bsum"))
        .withColumn(
            "__off",
            F.coalesce(
                F.sum("__bsum").over(
                    W.orderBy("__pid").rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
    )
    return (
        local.join(F.broadcast(offsets.select("__pid", "__off")), "__pid")
        .withColumn(sum_name, (F.col("__lsum") + F.col("__off")).cast("long"))
        .drop("__pid", "__lsum", "__off")
    )


N_DECILES = 10
RANK_BUCKETS = 64  # deterministic value buckets for the distributed rank


@REG.add(
    "equi_depth_deciles",
    f"""
    WITH o AS (SELECT o_orderkey, o_totalprice FROM orders
               WHERE o_totalprice IS NOT NULL),
    r AS (
      SELECT o_totalprice,
             row_number() OVER (ORDER BY o_totalprice, o_orderkey) AS rnk
      FROM o),
    n AS (SELECT count(*) AS n FROM o)
    SELECT CAST(floor((rnk - 1) * {N_DECILES} / n.n) + 1 AS BIGINT) AS decile,
           CAST(count(*) AS BIGINT) AS n_orders,
           min(o_totalprice) AS lo,
           max(o_totalprice) AS hi,
           {sql_dsum("o_totalprice")} AS total_price
    FROM r CROSS JOIN n
    GROUP BY 1
    """,
)
def equi_depth_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-depth deciles of order value — built on a DISTRIBUTED
    global rank, the operation a naive plan does with one
    row_number() over an unpartitioned window (all 100 TB through a
    single task; exactly what the oracle is allowed to do at sf0.01 and
    the engine is not). Two-pass shape, the pack_sequences prefix-sum
    idiom applied to ranking:

      1. a VALUE-DERIVED bucket id — equi-width on [min, max] of the sort
         column, computed from a column-pruned scalar pre-aggregation —
         keys a per-bucket row_number window (parallel across buckets);
      2. per-bucket row counts (tiny: one row per bucket) are
         prefix-summed in a single-partition window over RANK_BUCKETS
         rows, with the grand total taken off the same tiny frame, and
         broadcast back; global rank = local rank + bucket offset.

    The bucket id is deliberately a PURE FUNCTION OF THE VALUE, not
    ``repartitionByRange`` + ``spark_partition_id``: RangePartitioner
    SAMPLES its boundaries with a per-RDD seed, so the histogram branch
    re-executing the exchange could land rows in different partitions
    than the rank branch and silently corrupt the offsets unless
    exchange reuse happens to kick in (review finding). A value-derived
    bucket recomputes identically in every branch, and correctness needs
    only disjoint ordered buckets — not balanced ones. Skew trade-off:
    equi-width buckets inherit the value distribution's skew;
    RANK_BUCKETS (64) over-partitions to smooth it, and the named
    upgrade at real scale is quantile-derived boundaries from an
    approx-quantile pre-pass.

    The decile id is then a row-local expression (floor((rank-1)*10/N),
    the identical formula the oracle computes from its row_number — NOT
    ntile(), whose remainder distribution differs), and the per-decile
    stats are one partial-aggregatable hash agg.

    Fully LAZY: the [min, max] bucket boundaries ride a broadcast 1-row
    stats frame (crossJoin) instead of a construction-time ``.first()``
    (round-5/6 verdict carry-item — ``queries()[name]`` must not launch
    a job). The bucket stays a deterministic pure function of the value:
    exact min/max broadcast identically into the rank and histogram
    branches, so the alignment contract of ``bucketed_global_rank``
    holds. An empty (or all-NULL) orders table yields zero data rows
    after the crossJoin, so every downstream agg returns a schema-stable
    empty frame — no driver-side NULL guard needed (the old eager path
    required one because ``st.hi - st.lo`` raised on Python ``None``)."""
    o = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        # NULL prices are unrankable; dropped by the SAME predicate in the
        # oracle so an all-NULL table means "empty" on both engines
        # (review finding: a min()=NULL guard alone would return empty
        # while the oracle still ranked the NULL rows)
        .filter(F.col("o_totalprice").isNotNull())
    )
    st = o.agg(
        F.min("o_totalprice").alias("__lo"), F.max("o_totalprice").alias("__hi")
    )
    span = F.greatest(F.col("__hi") - F.col("__lo"), F.lit(1e-12))
    bucket = F.least(
        F.lit(RANK_BUCKETS - 1),
        F.floor((F.col("o_totalprice") - F.col("__lo")) / span * RANK_BUCKETS),
    ).cast("int")
    ranked = bucketed_global_rank(
        o.crossJoin(F.broadcast(st)), bucket, ["o_totalprice", "o_orderkey"]
    )
    decile = (
        F.floor((F.col("rnk") - 1) * N_DECILES / F.col("__n")) + 1
    ).cast("long")
    return (
        ranked.groupBy(decile.alias("decile"))
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            dsum("o_totalprice").alias("total_price"),
        )
    )


from ..functions.layout import sql_morton_key as _sql_morton_key

_SQL_MORTON = _sql_morton_key("l_partkey", "l_suppkey")

ZBUCKET_SHIFT = 10  # morton key >> 10: fine-grained curve buckets


@REG.add(
    "zorder_bucket_profile",
    f"""
    SELECT ({_SQL_MORTON} >> {ZBUCKET_SHIFT}) AS zbucket,
           CAST(count(*) AS BIGINT) AS n_rows,
           min(l_partkey) AS part_lo, max(l_partkey) AS part_hi,
           min(l_suppkey) AS supp_lo, max(l_suppkey) AS supp_hi
    FROM lineitem
    GROUP BY 1
    """,
)
def zorder_bucket_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) layout profile over (l_partkey, l_suppkey):
    interleave the two key dimensions' bits into one curve key and profile
    each high-order curve bucket — the clustering behind Delta/Iceberg
    Z-ORDER. Each bucket's (part_lo..part_hi, supp_lo..supp_hi) box is a
    small rectangle of the 2-D key space, which is exactly why a file
    layout sorted by the curve key gives selective parquet min/max zone
    maps on EITHER dimension (single-column range clustering,
    io.write_sorted_for_zone_maps, only prunes its own column). The key
    is pure integer shifts/masks (functions/layout.py) mirrored
    character-for-character in the oracle — no floats, bit-identical
    across engines. Row-local key + one partial-aggregatable hash agg;
    the write-side counterpart is io.write_zordered (pytest measures the
    per-file rectangle shrink vs a naive layout)."""
    from ..functions.layout import morton_key

    li = load_table(spark, sf_dir, "lineitem")
    z = morton_key(F.col("l_partkey"), F.col("l_suppkey"))
    return (
        li.groupBy(F.shiftright(z, ZBUCKET_SHIFT).alias("zbucket"))
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("l_partkey").alias("part_lo"),
            F.max("l_partkey").alias("part_hi"),
            F.min("l_suppkey").alias("supp_lo"),
            F.max("l_suppkey").alias("supp_hi"),
        )
    )


@REG.add(
    "key_skew_profile",
    """
    WITH k AS (
      SELECT l_suppkey AS key, CAST(count(*) AS BIGINT) AS cnt
      FROM lineitem GROUP BY 1)
    SELECT CAST(count(*) AS BIGINT)            AS n_keys,
           CAST(max(cnt) AS BIGINT)            AS max_cnt,
           CAST(min(cnt) AS BIGINT)            AS min_cnt,
           CAST(sum(cnt) AS BIGINT)            AS n_rows,
           CAST(max(cnt) AS DOUBLE) / (CAST(sum(cnt) AS DOUBLE) / count(*))
                                               AS skew_ratio
    FROM k
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostic: per-key cardinality profile collapsed
    to the numbers that predict whether a groupBy/join on this key will
    hot-spot — max vs mean per-key row count (skew_ratio ~1 = uniform;
    >>1 = a straggler task at shuffle time). This is the query you run
    BEFORE a 100 TB join to decide between a plain hash join, salting
    (skew_salted_join), or AQE skew-split. Two partial-aggregatable
    stages: (key) counts, then a 1-row reduce over them; the wide row
    count never leaves stage one."""
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy(F.col("l_suppkey").alias("key")).agg(
        F.count("*").cast("long").alias("cnt")
    )
    return k.agg(
        F.count("*").cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_cnt"),
        F.min("cnt").cast("long").alias("min_cnt"),
        F.sum("cnt").cast("long").alias("n_rows"),
        (
            F.max("cnt").cast("double")
            / (F.sum("cnt").cast("double") / F.count("*"))
        ).alias("skew_ratio"),
    )
