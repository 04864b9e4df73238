"""One arm of the exact-gate A/B: run the plain gate (and optionally the
bloom/ledger arm) over 10 x 5k-doc batches, report wall seconds AND total
Spark jobs (job ids are globally sequential; a probe action before/after
brackets the count). Usage: python gate_ab.py <repo_path> <arm> <out_json>
arm: plain | bloom | ledger
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO, ARM, OUT = sys.argv[1], sys.argv[2], sys.argv[3]
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
sc = spark.sparkContext

from akkastreamprocessnpmpackagedependencies_spark.session import load_table
from akkastreamprocessnpmpackagedependencies_spark.streaming import pipeline as sp


def cur_job_id() -> int:
    sc.setJobGroup("probe", "probe")
    sc.parallelize([0], 1).count()
    ids = sc.statusTracker().getJobIdsForGroup("probe")
    sc.setJobGroup(None, None)
    return max(ids)


d = load_table(spark, "/root/testdata/sf0.1", "documents").select("doc_id", "text")
copies = 10
parts = [d] + [
    d.select(
        (F.col("doc_id") + 1_000_000 * k).alias("doc_id"),
        F.concat(F.col("text"), F.lit(f" #c{k}")).alias("text"),
    )
    for k in range(1, copies)
]
big = parts[0]
for p in parts[1:]:
    big = big.unionByName(p)
big = big.localCheckpoint()
n_rows = big.count()
spark.range(1_000_000).selectExpr("sum(id)").collect()

work = tempfile.mkdtemp(prefix=f"gate_ab_{ARM}_")
try:
    src = os.path.join(work, "src")
    for part in range(10):
        big.filter(F.col("doc_id") % 10 == part).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    kw = {}
    if ARM == "bloom":
        kw = {"bloom_prefilter": True, "bloom_expected_keys": n_rows}
    elif ARM == "ledger":
        kw = {"ledger_path": os.path.join(work, "ledger")}
    corpus = os.path.join(work, "corpus")
    j0 = cur_job_id()
    t0 = time.perf_counter()
    q = (
        sp.write_exact_dedup_gated(
            spark.readStream.schema(big.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
            **kw,
        )
        .option("checkpointLocation", os.path.join(work, "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    wall = time.perf_counter() - t0
    j1 = cur_job_id()
    out = {
        "arm": ARM,
        "repo": REPO,
        "rows": n_rows,
        "batches": 10,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_rows / wall, 1),
        "spark_jobs": j1 - j0 - 1,
        "corpus_rows": spark.read.parquet(corpus).count(),
    }
    print(json.dumps(out))
    with open(OUT, "a") as f:
        f.write(json.dumps(out) + "\n")
finally:
    shutil.rmtree(work, ignore_errors=True)
