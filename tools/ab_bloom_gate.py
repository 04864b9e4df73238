"""Same-session A/B: ``write_exact_dedup_gated`` plain vs
``bloom_prefilter=True`` at the BENCH corpus size (round-12 verdict #1).

The committed round-11 gate-run ``BENCH_FULL.json`` recorded the
prefiltered gate at 0.71x the plain gate (607 vs 853 rows/s) while the
docstring claimed "cost-neutral when the corpus is batch-sized" — a
committed artifact contradicting the repo's prose. Cross-round bench
numbers for the gates swing with ambient drift and the two gates run
back-to-back in bench.py (order effects uncontrolled), so the only
sound adjudication is interleaved runs in ONE session on identical
pre-sliced data: alternating A/B/B/A order so slow drift and
first-run warmup hit both variants equally, fresh corpus + checkpoint
per run, best-of over the reps.

Usage: python tools/ab_bloom_gate.py [sf_dir] [out_json] [reps]
Defaults: sf0.1, BENCH_AB_bloom_gate.json, 3 reps per variant.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _run_variant(spark, write_gate, docs_schema, src, corpus, ck, **kw) -> float:
    t0 = time.monotonic()
    q = (
        write_gate(
            spark.readStream.schema(docs_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
            **kw,
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
        REPO, "BENCH_AB_bloom_gate.json"
    )
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from akkastreamprocessnpmpackagedependencies_spark.session import load_table
    from akkastreamprocessnpmpackagedependencies_spark.streaming import pipeline as sp

    work = tempfile.mkdtemp(prefix="ab_bloom_")
    # replicate bench.py's exact slicing: 3 micro-batch files by doc_id % 3
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_rows = d.count()
    src = os.path.join(work, "src")
    for part in range(3):
        d.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    result = {
        "sf_dir": sf_dir,
        "rows": n_rows,
        "ref": subprocess.run(
            ["git", "rev-parse", "HEAD"], cwd=REPO,
            capture_output=True, text=True, check=True,
        ).stdout.strip(),
        "variants": {},
    }
    runs: dict[str, list] = {"plain": [], "bloom": []}
    order = ["plain", "bloom"]
    for rep in range(reps):
        for name in order:
            corpus = os.path.join(work, f"corpus_{name}_{rep}")
            ck = os.path.join(work, f"ck_{name}_{rep}")
            kw = {"bloom_prefilter": True} if name == "bloom" else {}
            runs[name].append(
                _run_variant(spark, sp.write_exact_dedup_gated, d.schema,
                             src, corpus, ck, **kw)
            )
        order.reverse()  # ABBA: cancel within-rep ordering effects
    for name, secs in runs.items():
        best = min(secs)
        result["variants"][name] = {
            "runs_sec": [round(s, 3) for s in secs],
            "best_sec": round(best, 3),
            "rows_per_sec": round(n_rows / best, 1),
        }
    result["bloom_over_plain"] = round(
        result["variants"]["bloom"]["best_sec"]
        / result["variants"]["plain"]["best_sec"], 3,
    )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
