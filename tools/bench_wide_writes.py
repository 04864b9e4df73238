"""Measure the narrow/wide gate-append crossover that grounds
``WIDE_WRITES_ROWS`` (round 14: the auto switch initially landed with a
REASONED threshold of 100k rows — ~100 MiB, about a second of
single-task parquet encoding — and this study replaced the reasoning
with a measurement, the repo's measured-not-asserted rule; the
committed BENCH_wide_writes.json moved the constant to 25k, the
smallest size where the wide shape's win is decisive — 0.34x — rather
than inside spread-overlap noise).

What is timed: the exact write expression every gate's append runs —
``coalesce(1)`` (narrow) vs ``repartition(bucket)`` (wide) followed by
``write.mode("append").partitionBy(bucket).parquet(...)`` — over a
localCheckpointed synthetic docs frame (doc_id + ~1 KiB text + a
64-bucket hash column, the DECON_BUCKETS/EXACT_DEDUP_BUCKETS layout),
at a ladder of batch sizes bracketing the threshold. Shapes are
INTERLEAVED per rep (narrow, wide, narrow, wide, ...) so ambient drift
lands on both arms — the ab_chargram discipline — and every rep writes
to a fresh directory so no arm pays accumulated-listing costs the
other skipped.

Honest scope: this is a single-JVM local[N] measurement against a
local filesystem. The headline finding transfers to any regime: both
shapes write the SAME one-file-per-touched-bucket layout (hash
partitioning lands each bucket in exactly one task), so the trade is
purely the wide shape's extra shuffle stage vs its parallel encode —
there is no small-files argument for the narrow shape, only a
per-micro-batch stage-latency one, which is why tiny batches stay
narrow. A 1000-executor cluster writing to an object store moves the
constants (shuffle round-trip latency up, per-task encode throughput
flat), which is exactly why the switch is a module constant with a
manual override rather than a hardcoded shape.

Usage: python tools/bench_wide_writes.py [out_json]
Default out: BENCH_wide_writes.json in the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = (1_000, 2_500, 5_000, 10_000, 25_000, 100_000, 400_000)
REPS = 5
# round 15 (r14 verdict #4): the 5k rung showed wide 0.76x with NEARLY
# separated spreads at 5 reps — re-measure the small rungs at triple
# the rep count (and add 1k/2.5k/10k rungs) to decide whether the
# threshold halves. Large rungs stay at REPS (their spreads were
# already decisively separated and each rep is seconds long).
REPS_SMALL = 15
SMALL_CUTOFF = 25_000
BUCKETS = 64  # DECON_BUCKETS == EXACT_DEDUP_BUCKETS
TOKENS_PER_DOC = 120  # ~1 KiB of text per doc


def main() -> None:
    out_json = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "BENCH_wide_writes.json"
    )
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="wide_writes_")
    try:
        tok_cols = F.concat_ws(
            " ",
            *[F.concat(F.lit("w"), F.col("id"), F.lit(f"t{t}"))
              for t in range(TOKENS_PER_DOC)],
        )
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

        result = {
            "op": "gate append write shape (narrow coalesce(1) vs wide "
                  "repartition(bucket))",
            "buckets": BUCKETS,
            "reps_per_shape": REPS,
            "tokens_per_doc": TOKENS_PER_DOC,
            "sizes": {},
        }
        for size in SIZES:
            rows = (
                spark.range(size)
                .select(
                    F.col("id").alias("doc_id"),
                    tok_cols.alias("text"),
                    F.pmod(F.xxhash64("id"), F.lit(BUCKETS)).alias(
                        "doc_bucket"
                    ),
                )
                .localCheckpoint()  # input build must not be timed
            )
            reps = REPS_SMALL if size <= SMALL_CUTOFF else REPS
            samples: dict[str, list[float]] = {"narrow": [], "wide": []}
            for rep in range(reps):
                for shape in ("narrow", "wide"):  # interleaved
                    out = os.path.join(work, f"o_{size}_{shape}_{rep}")
                    shaped = (
                        rows.coalesce(1) if shape == "narrow"
                        else rows.repartition("doc_bucket")
                    )
                    t0 = time.perf_counter()
                    shaped.write.mode("append").partitionBy(
                        "doc_bucket"
                    ).parquet(out)
                    samples[shape].append(time.perf_counter() - t0)
            med = {
                s: round(statistics.median(v), 3) for s, v in samples.items()
            }
            result["sizes"][str(size)] = {
                "reps": reps,
                "narrow_sec": med["narrow"],
                "wide_sec": med["wide"],
                "narrow_spread": [round(min(samples["narrow"]), 3),
                                  round(max(samples["narrow"]), 3)],
                "wide_spread": [round(min(samples["wide"]), 3),
                                round(max(samples["wide"]), 3)],
                "wide_over_narrow": round(med["wide"] / med["narrow"], 3),
            }
            rows.unpersist()
        # smallest measured size where the wide shape is at least as
        # fast — the local-regime crossover WIDE_WRITES_ROWS must sit
        # at or below
        cross = [
            int(s) for s, r in result["sizes"].items()
            if r["wide_over_narrow"] <= 1.0
        ]
        result["local_crossover_rows"] = min(cross) if cross else None
        from akkastreamprocessnpmpackagedependencies_spark.streaming.pipeline import (
            WIDE_WRITES_ROWS,
        )

        result["wide_writes_rows_constant"] = WIDE_WRITES_ROWS
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
