"""Volume economics for ``write_decontaminated`` (round-12 verdict #3):
the per-round bench drives the gate at micro-batch sizes with
contamination in every batch, which is the worst-case path; this
measures the two shapes that actually bound a production ingest in one
session:

- ``clean_auto``: 10 x 5k-doc batches of guaranteed-benchmark-disjoint
  docs through the AUTO-sized filter (~10 bits/gram, ~1% per-GRAM FPR).
  The honest caveat this study exists to record: per-DOC suspect
  probability is 1-(1-fpr)^grams_per_doc, so at ~1% per-gram FPR a
  ~56-gram doc is a bloom suspect ~43% of the time — the prescreen
  admits the batch correctly but still opens the benchmark and runs the
  confirm join for the false-positive docs.
- ``clean_sized``: the same clean batches with ``bloom_bits`` sized for
  doc-level FPR (2^26 bits = 8 MiB broadcast, per-gram FPR ~1e-9):
  zero suspects, the confirm join and the benchmark read never happen —
  the suspect-free fast path a sized deployment sees.
- ``contaminated``: 10% of EACH batch replaced by full benchmark-doc
  copies (the contamination predicate is on ``doc_id // 10`` so it is
  orthogonal to the ``doc_id % N_BATCHES`` batch split — a round-13
  review caught the original ``doc_id % 10`` stride aliasing with the
  split, which silently measured one 100%-contaminated batch plus nine
  clean ones), auto-sized filter: prescreen + exact confirm +
  quarantine in every batch.

Usage: python tools/bench_decon_volume.py [sf_dir] [out_json]
Defaults: sf0.1, BENCH_decon_volume.json in the repo root.
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

N_BATCHES = 10
ROWS_PER_BATCH = 5_000
BENCH_DOCS = 500  # benchmark = first 500 sf docs' distinct 5-grams
TOKENS_PER_DOC = 60  # clean synthetic docs: 56 5-grams each


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_decon_volume.json"
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

    work = tempfile.mkdtemp(prefix="decon_vol_")
    try:
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        bench_grams = os.path.join(work, "bench_grams")
        n_grams = sp.write_benchmark_grams(
            spark, d.filter(F.col("doc_id") < BENCH_DOCS), bench_grams, n=5
        )

        total = N_BATCHES * ROWS_PER_BATCH
        # clean docs: every token is unique to its doc, so no 5-gram can
        # exist in the benchmark — any suspect is a bloom false positive
        tok_cols = F.concat_ws(
            " ",
            *[F.concat(F.lit("w"), F.col("id"), F.lit(f"t{t}"))
              for t in range(TOKENS_PER_DOC)],
        )
        clean = (
            spark.range(total)
            .select(F.col("id").alias("doc_id"), tok_cols.alias("text"))
            .localCheckpoint()  # freeze: input build must not be timed
        )
        # contaminated stream: 10% of each batch are verbatim benchmark docs
        bench_texts = (
            d.filter(F.col("doc_id") < BENCH_DOCS)
            .select((F.col("doc_id") % 10).alias("slot"), "text")
            .groupBy("slot").agg(F.first("text").alias("bench_text"))
        )
        # contaminate (doc_id // 10) % 10 == 0 — exactly 10% of every
        # batch, since batches split on doc_id % N_BATCHES (orthogonal
        # moduli); vary which benchmark doc via (doc_id // 100) % 10,
        # a stride orthogonal to BOTH the batch split and the
        # contamination predicate (second review pass: doc_id % 10
        # would collapse each batch's contamination onto one benchmark
        # doc, understating gram diversity)
        contaminated = (
            clean.withColumn("slot", (F.col("doc_id") / 100).cast("long") % 10)
            .join(F.broadcast(bench_texts), "slot", "left")
            .select(
                "doc_id",
                F.when(
                    (F.col("doc_id") / 10).cast("long") % 10 == 0,
                    F.coalesce(F.col("bench_text"), F.col("text")),
                ).otherwise(F.col("text")).alias("text"),
            )
            .localCheckpoint()
        )

        def src_of(df, name: str) -> str:
            src = os.path.join(work, name)
            for part in range(N_BATCHES):
                df.filter(F.col("doc_id") % N_BATCHES == part).coalesce(
                    1
                ).write.mode("append").parquet(src)
            return src

        clean_src = src_of(clean, "clean_src")
        cont_src = src_of(contaminated, "cont_src")
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

        arms = (
            ("clean_auto", clean_src, {}),
            ("clean_sized", clean_src, {"bloom_bits": 1 << 26}),
            ("contaminated", cont_src, {}),
        )
        result = {
            "op": "write_decontaminated",
            "sf_dir": sf_dir,
            "benchmark_grams": n_grams,
            "batches": N_BATCHES,
            "rows_per_batch": ROWS_PER_BATCH,
            "arms": {},
        }
        for arm, src, kw in arms:
            out = os.path.join(work, f"out_{arm}")
            ck = os.path.join(work, f"ck_{arm}")
            t0 = time.perf_counter()
            q = (
                sp.write_decontaminated(
                    spark.readStream.schema(clean.schema)
                    .option("maxFilesPerTrigger", 1)
                    .parquet(src),
                    bench_grams, out, n=5, **kw,
                )
                .option("checkpointLocation", ck)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            wall = time.perf_counter() - t0
            qpath = out + "_quarantine"
            n_quar = (
                spark.read.parquet(qpath).count()
                if sp.table_exists(spark, qpath) else 0
            )
            result["arms"][arm] = {
                "wall_sec": round(wall, 3),
                "rows_per_sec": round(total / wall, 1),
                "quarantined": n_quar,
            }
        a = result["arms"]
        result["sized_over_auto_clean"] = round(
            a["clean_sized"]["rows_per_sec"] / a["clean_auto"]["rows_per_sec"], 2
        )
        result["contaminated_over_clean_auto"] = round(
            a["contaminated"]["rows_per_sec"] / a["clean_auto"]["rows_per_sec"], 2
        )
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
        print(json.dumps(result))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
