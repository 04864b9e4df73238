"""Volume-scaling evidence for ``write_exact_dedup_gated`` (round-10
verdict #7): the per-round bench drives it at ~5k-row micro-batches,
where the ~759 rows/s is per-batch OVERHEAD (query planning, sidecar
read, file listing), not the gate kernel — the same lesson as the GK
kernel A/B. This runs the SAME gate in one session at increasing batch
volumes (one parquet file per micro-batch, so batch size == file size)
and records rows/s per volume; if throughput rises with batch size the
gate is overhead-bound and scales with volume, which is the shape a
1000-executor deployment (large micro-batches) actually sees.

Usage: python tools/bench_exact_gate_volume.py [sf_dir] [out_json]
Defaults: sf0.1 (50k documents), BENCH_exact_gate_volume.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# files per run: 50k docs -> 10 x 5k (the per-round bench shape),
# 4 x 12.5k, 1 x 50k
SPLITS = (10, 4, 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_exact_gate_volume.json"
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

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # sf0.1 holds 5k documents; the round-10 verdict asks for evidence at
    # 50k+ rows per batch, so replicate with DISTINCT ids and texts (the
    # gate would legitimately drop exact duplicates) — a real 10x corpus,
    # not an extrapolation
    copies = int(os.environ.get("EXACT_GATE_COPIES", "10"))
    if copies > 1:
        base = d
        parts = [base]
        for k in range(1, copies):
            parts.append(
                base.select(
                    (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
                    F.concat(F.col("text"), F.lit(f" #c{k}")).alias("text"),
                )
            )
        d = parts[0]
        for p in parts[1:]:
            d = d.unionByName(p)
        d = d.localCheckpoint()  # freeze: input build must not be timed
    n_rows = d.count()
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm the JVM

    work = tempfile.mkdtemp(prefix="exact_gate_vol_")
    result = {
        "op": "write_exact_dedup_gated",
        "sf_dir": sf_dir,
        "rows": n_rows,
        "volumes": [],
    }
    try:
        for n_files in SPLITS:
            src = os.path.join(work, f"src_{n_files}")
            for part in range(n_files):
                d.filter(F.col("doc_id") % n_files == part).coalesce(
                    1
                ).write.mode("append").parquet(src)
            corpus = os.path.join(work, f"corpus_{n_files}")
            ck = os.path.join(work, f"ck_{n_files}")
            t0 = time.perf_counter()
            q = (
                sp.write_exact_dedup_gated(
                    spark.readStream.schema(d.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src),
                    corpus,
                )
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            wall = time.perf_counter() - t0
            result["volumes"].append(
                {
                    "batches": n_files,
                    "rows_per_batch": round(n_rows / n_files),
                    "wall_sec": round(wall, 3),
                    "rows_per_sec": round(n_rows / wall, 1),
                }
            )
        small = result["volumes"][0]["rows_per_sec"]
        big = result["volumes"][-1]["rows_per_sec"]
        result["big_over_small_throughput"] = round(big / small, 2)
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
