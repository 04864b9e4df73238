"""Event-time operators over the ``events`` table, batch form: tumbling and
sliding windows, sessionization, as-of join. The streaming variants (with
watermarks and state stores) live in ``streaming/``; these batch forms are
the DuckDB-verifiable semantics.

The reference has no timestamps at all (SURVEY.md §2.8); this is the
north-star event-time surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ..session import load_table
from .registry import Registry, dsum, sql_dsum

REG = Registry()

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds


@REG.add(
    "events_tumbling_1h",
    f"""
    SELECT date_trunc('hour', ts) AS window_start, event_type,
           count(*) AS n,
           {sql_dsum("value")} AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def events_tumbling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (F.window — the same operator the
    streaming variant uses with a watermark)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("*").alias("n"), dsum("value").alias("total_value"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "total_value")
    )


@REG.add(
    "events_sliding_1h_30m",
    """
    SELECT ws AS window_start, event_type, count(*) AS n
    FROM (
      SELECT event_type,
             unnest([time_bucket(INTERVAL '30 minutes', ts),
                     time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE]) AS ws
      FROM events)
    GROUP BY ws, event_type
    """,
)
def events_sliding_1h_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 1-hour width, 30-minute hop — each event lands in
    exactly two windows (oracle enumerates both starts explicitly)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("window.start").alias("window_start"), "event_type", "n")
    )


_SESSION_SQL = f"""
    WITH marked AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                       OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                  THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM marked)
    SELECT user_id, session_id, count(*) AS n_events,
           min(ts) AS session_start, max(ts) AS session_end
    FROM numbered GROUP BY user_id, session_id
"""


@REG.add("events_sessionize", _SESSION_SQL)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: a >30-min silence starts a new session. Classic
    lag-gap-flag + running-sum session ids; one shuffle on user_id, both
    windows share the same partitioning (no second shuffle)."""
    e = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    marked = e.select(
        "user_id", "ts", "event_id",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), 1).otherwise(0).alias("is_new"),
    )
    numbered = marked.select(
        "user_id", "ts",
        F.sum("is_new").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)).alias("session_id"),
    )
    return numbered.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
    )


@REG.add(
    "asof_purchase_signup",
    """
    SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def asof_purchase_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase, the latest signup at-or-before it by
    the same user. Spark lacks a native ASOF JOIN; the scalable idiom is
    union-the-streams + running last_value over one time-sorted window —
    one shuffle on user_id, no per-key loops, no range-join blowup.
    (DuckDB's native ASOF JOIN is the oracle.)"""
    e = load_table(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("purchase", "signup")).select(
        "event_id", "user_id", "ts",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts_raw"),
    )
    # signup sorts before purchase at identical ts (is_purchase 0 < 1), so an
    # equal-timestamp signup is visible to the purchase — matches p.ts >= s.ts.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        tagged.withColumn("signup_ts", F.last("signup_ts_raw", ignorenulls=True).over(w))
        .filter(F.col("is_purchase") == 1)
        .select("event_id", "user_id", "ts", "signup_ts")
    )
