"""Same-session A/B harness pricing the snapshot ledger's per-batch
cost on the exact-dedup gate: identical pre-sliced document files
ingested through ``write_exact_dedup_gated`` with ``ledger_path`` OFF
vs ON, interleaved so ambient drift hits both arms equally (the repo's
standing measurement discipline — cross-round totals are void under
concurrent load, BENCH_AB_* artifacts are the adjudication format).

The ledger adds, per admitting batch: one tiny per-bucket partial agg
over the (already localCheckpointed) admitted frame, one O(ledger)
max-version read, one O(buckets) state read + join, and one
coalesce(1) append — all control-plane-sized; the hypothesis under
test is that the overhead is a small constant per batch, not
row-proportional.

Usage: python tools/ab_ledger.py [sf_dir] [out_json]
Defaults: sf0.1 and BENCH_AB_ledger.json in the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run_variant(spark, schema, src, corpus, ck, ledger):
    from akkastreamprocessnpmpackagedependencies_spark.streaming import pipeline as sp

    t0 = time.monotonic()
    q = (
        sp.write_exact_dedup_gated(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
            ledger_path=ledger,
        )
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return time.monotonic() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_AB_ledger.json"
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
    from akkastreamprocessnpmpackagedependencies_spark.session import load_table
    from akkastreamprocessnpmpackagedependencies_spark.streaming import pipeline as sp

    work = tempfile.mkdtemp(prefix="ab_ledger_")
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = d.count()
    src = os.path.join(work, "src")
    n_batches = 8  # amplify the per-batch overhead hypothesis
    for part in range(n_batches):
        d.filter(F.col("doc_id") % n_batches == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    runs: dict[str, list] = {"off": [], "on": []}
    for rep in range(2):
        for name in ("off", "on"):
            corpus = os.path.join(work, f"corpus_{name}_{rep}")
            ledger = (
                os.path.join(work, f"ledger_{name}_{rep}")
                if name == "on" else None
            )
            secs = _run_variant(
                spark, d.schema, src, corpus,
                os.path.join(work, f"ck_{name}_{rep}"), ledger,
            )
            runs[name].append(secs)
    result = {
        "sf_dir": sf_dir, "rows": n_rows, "n_batches": n_batches,
        "variants": {
            name: {
                "runs_sec": [round(s, 3) for s in secs],
                "best_sec": round(min(secs), 3),
                "rows_per_sec": round(n_rows / min(secs), 1),
            }
            for name, secs in runs.items()
        },
    }
    result["on_over_off"] = round(
        result["variants"]["on"]["best_sec"]
        / result["variants"]["off"]["best_sec"], 3,
    )
    result["overhead_sec_per_batch"] = round(
        (result["variants"]["on"]["best_sec"]
         - result["variants"]["off"]["best_sec"]) / n_batches, 3,
    )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()


def _self_check() -> None:  # imported by tests/test_bench_tools.py
    """Static invariants only (the live run needs a quiet session)."""
    assert callable(main)
