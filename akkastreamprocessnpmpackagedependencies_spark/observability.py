"""Pipeline observability via Spark's ``observe`` API: named aggregate
metrics computed DURING an action's single pass over the data — no second
scan, no separate count() job. The engine-side answer to "how many rows
did this stage actually emit / drop / null out", which the reference can
only learn by printing inside the sink (Main.scala:88-95).

Batch: ``Observation`` delivers the metrics dict after the first action.
Streaming: the same ``observe`` call surfaces per-micro-batch metrics in
``StreamingQueryProgress.observedMetrics`` — the hook a production
pipeline feeds into its metrics system.

At 100 TB this is the only affordable way to audit a pipeline run:
metrics ride the existing pass as extra aggregate expressions (codegen'd,
partial-aggregated), so cost is O(columns observed), not O(data re-read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_rows(df: DataFrame, name: str = "rows") -> tuple[DataFrame, Observation]:
    """Attach a row-count observation. Returns (df, observation); read
    ``observation.get`` after the first action on the returned frame."""
    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n_rows")), obs


def observed_quality(
    df: DataFrame, rules: dict[str, "F.Column"], name: str = "quality"
) -> tuple[DataFrame, Observation]:
    """Attach named violation counters (rule name -> boolean Column that is
    TRUE on violation) plus a total row count, all computed in the same
    pass as the consuming action — the streaming/inline companion of the
    batch ``dq_expectations`` audit."""
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum(F.when(cond, 1).otherwise(0)).alias(rule) for rule, cond in rules.items()
    ]
    return df.observe(obs, *metrics), obs


def observe_stream(df: DataFrame, name: str, *metrics: "F.Column") -> DataFrame:
    """Streaming form: attach named metrics to an unbounded DataFrame; each
    micro-batch reports them in StreamingQueryProgress.observedMetrics
    (an Observation object is batch-only, so streaming passes the name)."""
    return df.observe(name, *metrics)
