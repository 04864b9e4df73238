"""User-defined extension surfaces: Python UDTF (table function), grouped
Pandas transform (``applyInPandas``, the batch UDAF idiom), and the pure-SQL
entry point over registered views.

The reference has no registration surface at all (SURVEY.md §2.8) — its
"functions" are hard-wired Scala lambdas. These operators prove the engine
exposes every Spark extension point a user would reach for when the
built-ins run out, while the docstrings spell out the cost model (Arrow
batches, one Python worker per core — never row-at-a-time pickling).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import udtf

from ..session import load_table
from .registry import Registry

REG = Registry()


@udtf(returnType="sent_idx int, sentence string, n_chars int")
class SplitSentences:
    """UDTF: one input document -> N sentence rows. Lateral-joined per row,
    executed in an Arrow-batched Python worker."""

    def eval(self, text: str):  # noqa: A002
        if text is None:
            return
        for i, raw in enumerate(text.split(".")):
            s = raw.strip()
            if s:
                yield i, s, len(s)


@REG.add(
    "udtf_sentences",
    """
    SELECT doc_id, sent_idx, sentence, length(sentence) AS n_chars
    FROM (
      SELECT doc_id, generate_subscripts(parts, 1) - 1 AS sent_idx,
             trim(unnest(parts)) AS sentence
      FROM (SELECT doc_id, string_split(text, '.') AS parts FROM documents)
    )
    WHERE sentence <> ''
    """,
)
def udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered Python UDTF applied laterally over documents: sentence
    split with positional index. The DuckDB oracle reproduces it with
    unnest + generate_subscripts, proving the UDTF path end to end."""
    spark.udtf.register("split_sentences", SplitSentences)
    d = load_table(spark, sf_dir, "documents")
    d.createOrReplaceTempView("udtf_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars
        FROM udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


@REG.add(
    "grouped_median_pandas",
    """
    SELECT lang,
           count(*) AS n_docs,
           quantile_cont(length(text), 0.5) AS median_len,
           min(length(text))::BIGINT AS min_len,
           max(length(text))::BIGINT AS max_len
    FROM documents GROUP BY lang
    """,
)
def grouped_median_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped aggregate via applyInPandas — the batch form of a
    UDAF: each language group arrives as one Arrow-backed pandas frame and
    returns one summary row. numpy's linear-interpolation median matches
    SQL quantile_cont exactly. At 100 TB the shuffle key (lang) is low-
    cardinality, so this pattern needs a salting pre-agg if groups exceed
    executor memory — documented limit of whole-group UDAFs vs the
    streaming partial aggregation built-ins get for free."""
    import numpy as np

    d = load_table(spark, sf_dir, "documents").select("lang", F.length("text").alias("n"))

    def summarize(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["n"].to_numpy(dtype="float64")
        return pd.DataFrame(
            {
                "lang": [pdf["lang"].iloc[0]],
                "n_docs": [len(n)],
                "median_len": [float(np.percentile(n, 50))],
                "min_len": [int(n.min())],
                "max_len": [int(n.max())],
            }
        )

    return d.groupBy("lang").applyInPandas(
        summarize, "lang string, n_docs long, median_len double, min_len long, max_len long"
    )


@REG.add(
    "sql_api_revenue_by_nation",
    """
    SELECT n_name, {dsum} AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """.format(
        dsum="CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE)"
    ),
)
def sql_api_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL entry point: tables registered as temp views, query
    expressed as one ANSI SQL string via ``spark.sql`` — same Catalyst
    plan as the DataFrame form (the two APIs are front-ends to one
    optimizer). The oracle is literally the same SQL."""
    for t in ("lineitem", "orders", "customer", "nation"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT n_name,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        GROUP BY n_name
        """
    )


ASOF_BUCKETS = 64  # cogroup key buckets: amortize per-invocation pandas overhead


@REG.add(
    "asof_cogroup_pandas",
    """
    SELECT p.event_id, p.user_id, p.ts, s.ts AS signup_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
      ON p.user_id = s.user_id AND p.ts >= s.ts
    """,
)
def asof_cogroup_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The as-of join implemented on the COGROUP surface. Same semantics
    as ``asof_purchase_signup`` (timeseries.py) — which solves it with a
    union + running last_value window, the preferred pure-JVM plan —
    registered as the second physical strategy to pin the cogroup API:
    at 100 TB you pick the window form unless the per-key logic outgrows
    SQL (model scoring, custom matching), at which point this shape is
    the escape hatch with the same one-shuffle-per-side cost. The same
    DuckDB ASOF oracle verifies both, so the two strategies are provably
    value-identical.

    The cogroup key is a BUCKET of the join key (user_id % ASOF_BUCKETS),
    not user_id itself: applyInPandas invokes the Python function once
    per distinct key, and at ~1500 user keys the fixed per-invocation
    cost (Arrow batch framing + function call) was the measured floor
    (~5 s at sf0.1 for a trivial body). Bucketing amortizes it to
    ASOF_BUCKETS invocations, and the per-user as-of runs VECTORIZED
    inside the bucket via ``pd.merge_asof(by="user_id")`` — one sort +
    one merged backward scan per bucket. Same shuffle (hash on the
    bucket is hash on a function of the key), ~25x fewer Python calls;
    measured 7.2 s -> 1.2 s at sf0.1 (the remaining cost is the real merge work)."""
    # The two sides are built from SEPARATE scans on purpose. Deriving
    # both from one events DataFrame makes this a self-source cogroup:
    # DeduplicateRelations re-ids the right child's attributes, and
    # ColumnPruning then strips the right side down to its grouping key
    # whenever the consumer doesn't read the full cogroup output (count(),
    # select of a subset) — the pandas function receives signups WITHOUT
    # its ts column and the join silently can't do its job (observed on
    # Spark 4.1: `out.count()` delivered scols=['user_id']). Independent
    # scans keep the attribute ids unique so pruning preserves both
    # sides; the merge function also hard-fails on the symptom below
    # rather than returning wrong rows.
    purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", (F.col("user_id") % ASOF_BUCKETS).alias("b"))
    )
    signups = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("user_id", "ts", (F.col("user_id") % ASOF_BUCKETS).alias("b"))
    )

    def merge(p: pd.DataFrame, s: pd.DataFrame) -> pd.DataFrame:
        if "ts" not in s.columns:
            raise ValueError(
                "cogroup right side arrived without its data columns "
                f"(got {list(s.columns)}): the self-source cogroup pruning "
                "hazard — see the scan-separation comment in "
                "asof_cogroup_pandas"
            )
        if len(p) == 0:
            return pd.DataFrame({"event_id": [], "user_id": [], "ts": [], "signup_ts": []})
        p = p.sort_values("ts", kind="stable")
        if len(s) == 0:
            out = p[["event_id", "user_id", "ts"]].copy()
            out["signup_ts"] = pd.NaT
            return out
        s = s.sort_values("ts", kind="stable")
        out = pd.merge_asof(
            p[["event_id", "user_id", "ts"]],
            s.rename(columns={"ts": "signup_ts"}).assign(ts=s["ts"]),
            on="ts",
            by="user_id",
            direction="backward",
        )
        return out[["event_id", "user_id", "ts", "signup_ts"]]

    return (
        purchases.groupBy("b")
        .cogroup(signups.groupBy("b"))
        .applyInPandas(merge, "event_id long, user_id long, ts timestamp, signup_ts timestamp")
    )
