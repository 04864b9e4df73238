"""Scalar function surface: string, date/time, math, array, and JSON
functions — all JVM-side built-ins (whole-stage codegen; no Python in the
row path). The reference's entire scalar surface is UTF-8 decode, newline
split, string concat and string equality (SURVEY.md §2.8); the rest is the
driver-mandated generalization.

Oracle caveats encoded here: only engine-portable deterministic functions
are used (no libm transcendentals like pow/exp/ln whose last-ulp behavior
differs between JVM and C++).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import load_table
from .registry import Registry

REG = Registry()


@REG.add(
    "string_funcs",
    """
    SELECT p_partkey,
           upper(p_name)                          AS uname,
           lower(p_brand)                         AS lbrand,
           length(p_name)                         AS name_len,
           substr(p_name, 1, 5)                   AS prefix,
           p_brand || ' ' || p_type               AS label,
           replace(p_name, ' ', '_')              AS snake,
           lpad(CAST(p_size AS VARCHAR), 3, '0')  AS padded_size,
           CASE WHEN p_name LIKE '%gold%' THEN 1 ELSE 0 END AS has_gold
    FROM part
    """,
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("uname"),
        F.lower("p_brand").alias("lbrand"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("prefix"),
        F.concat_ws(" ", "p_brand", "p_type").alias("label"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("snake"),
        F.lpad(F.col("p_size").cast("string"), 3, "0").alias("padded_size"),
        F.when(F.col("p_name").like("%gold%"), 1).otherwise(0).alias("has_gold"),
    )


@REG.add(
    "date_funcs",
    """
    SELECT o_orderkey,
           year(o_orderdate)                      AS y,
           month(o_orderdate)                     AS m,
           day(o_orderdate)                       AS d,
           quarter(o_orderdate)                   AS q,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS due
    FROM orders
    """,
)
def date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        F.dayofmonth("o_orderdate").alias("d"),
        F.quarter("o_orderdate").alias("q"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).cast("timestamp").alias("month_end"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).cast("timestamp").alias("due"),
    )


@REG.add(
    "math_funcs",
    """
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1)       AS price_r1,
           abs(l_quantity - 25)            AS dist25,
           CAST(ceil(l_discount * 100) AS BIGINT)  AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT)      AS tax_pct_floor,
           sqrt(l_quantity)                        AS qty_sqrt,
           l_orderkey % 7                          AS okey_mod7,
           CAST(sign(l_quantity - 25.0) AS INT)    AS qty_sign
    FROM lineitem
    """,
)
def math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.abs(F.col("l_quantity") - 25).alias("dist25"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).alias("okey_mod7"),
        F.signum(F.col("l_quantity") - 25.0).cast("int").alias("qty_sign"),
    )


@REG.add(
    "array_funcs",
    """
    SELECT doc_id,
           len(string_split(text, ' '))                        AS n_tokens,
           len(list_distinct(string_split(text, ' ')))         AS n_unique,
           list_sort(string_split(text, ' '))[1]               AS first_token,
           list_contains(string_split(text, ' '), 'spark')     AS has_spark
    FROM documents
    """,
)
def array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops over tokenized text: split/size/distinct/sort/contains."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_unique"),
        F.element_at(F.sort_array(toks), 1).alias("first_token"),
        F.array_contains(toks, "spark").alias("has_spark"),
    )


@REG.add(
    "map_funcs",
    """
    WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    counts AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY doc_id, tok)
    SELECT doc_id, max(c) AS max_tok_freq, count(*) AS n_unique
    FROM counts GROUP BY doc_id
    """,
)
def map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term-frequency map per document built with aggregate+map_from_entries,
    then consumed with map_values — exercises MapType end to end."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    tf = (
        toks.groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
        .groupBy("doc_id")
        .agg(F.map_from_entries(F.collect_list(F.struct("tok", "c"))).alias("tf"))
    )
    return tf.select(
        "doc_id",
        F.array_max(F.map_values("tf")).alias("max_tok_freq"),
        F.size(F.map_keys("tf")).cast("long").alias("n_unique"),
    )


@REG.add(
    "json_funcs",
    """
    SELECT event_type,
           count(*)                                                  AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
                    THEN 1 ELSE 0 END) AS BIGINT)                    AS n_k_gt50
    FROM events GROUP BY event_type
    """,
)
def json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON field extraction from the events.props payload column —
    the from_json/get_json_object surface the flagship parser also uses."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.sum(F.when(k > 50, 1).otherwise(0)).alias("n_k_gt50"),
    )


@REG.add(
    "json_corrupt_tolerant",
    """
    WITH raw AS (
      SELECT event_type,
             CASE WHEN event_id % 7 = 0 THEN substr(props, 1, 3) ELSE props END AS j
      FROM events),
    parsed AS (
      SELECT event_type,
             CASE WHEN json_valid(j)
                  THEN CAST(json_extract_string(j, '$.k') AS BIGINT) END AS k
      FROM raw)
    SELECT event_type, count(*) AS n_rows, count(k) AS n_valid,
           count(*) - count(k) AS n_corrupt, CAST(sum(k) AS BIGINT) AS sum_k
    FROM parsed GROUP BY event_type
    """,
)
def json_corrupt_tolerant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-record tolerance, engine-level: every 7th props payload is
    truncated into invalid JSON, and PERMISSIVE ``from_json`` turns it into
    a null struct instead of failing the job — the declarative version of
    the reference's swallow-the-exception error model
    (reference: src/main/scala/NpmPackage.scala:17-19,
    src/main/scala/Version.scala:10-12). Valid/corrupt/aggregate counts per
    event type prove nulls propagate without poisoning the aggregation."""
    e = load_table(spark, sf_dir, "events")
    j = F.when(F.col("event_id") % 7 == 0, F.col("props").substr(1, 3)).otherwise(
        F.col("props")
    )
    k = F.from_json(j, "k BIGINT")["k"]
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_rows"),
            F.count("k").alias("n_valid"),
            (F.count("*") - F.count("k")).alias("n_corrupt"),
            F.sum("k").alias("sum_k"),
        )
    )


@REG.add(
    "unpivot_part_metrics",
    """
    SELECT p_partkey, metric, value
    FROM (
      SELECT p_partkey,
             CAST(p_size AS DOUBLE) AS size,
             p_retailprice          AS retailprice
      FROM part)
    UNPIVOT (value FOR metric IN (size, retailprice))
    """,
)
def unpivot_part_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide metric columns -> (key, metric, value) long
    form, the inverse of pivot_linestatus. Narrow transformation, no
    shuffle — each input row emits its metric rows in place."""
    p = load_table(spark, sf_dir, "part")
    wide = p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("retailprice"),
    )
    return wide.unpivot("p_partkey", ["size", "retailprice"], "metric", "value")
