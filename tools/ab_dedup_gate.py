"""Same-session A/B harness for ``write_dedup_gated`` (round-9 verdict
#4: commit the adjudication evidence as an artifact, not a prose note).

Cross-round bench numbers for the gate swing with FS/JVM ambient drift
(see tools/bench_compare.py's two-run reproduction gate), so the only
sound way to adjudicate a suspected regression on it is an A/B in ONE
session on identical data: the OLD variant is materialized from git
history into the package (so its relative imports resolve), both
variants ingest the same pre-sliced document files through a fresh
corpus each, and the artifact records wall seconds + rows/s per variant
plus the git refs compared.

Usage: python tools/ab_dedup_gate.py [old_ref] [sf_dir] [out_json]
Defaults: the commit before the current streaming pipeline, sf0.1, and
BENCH_AB_dedup_gate.json in the repo root.
"""

from __future__ import annotations

import importlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PKG = "akkastreamprocessnpmpackagedependencies_spark"
PIPELINE_REL = f"{PKG}/streaming/pipeline.py"
AB_MODULE = f"{PKG}.streaming._pipeline_ab_old"
AB_FILE = os.path.join(REPO, PKG, "streaming", "_pipeline_ab_old.py")


def _materialize_old(ref: str) -> None:
    src = subprocess.run(
        ["git", "show", f"{ref}:{PIPELINE_REL}"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    with open(AB_FILE, "w") as f:
        f.write(src)


def _run_variant(spark, write_dedup_gated, docs_schema, src, corpus, ck):
    t0 = time.monotonic()
    q = (
        write_dedup_gated(
            spark.readStream.schema(docs_schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            corpus,
        )
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return time.monotonic() - t0


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else "HEAD~1"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "BENCH_AB_dedup_gate.json"
    )
    import tempfile

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from akkastreamprocessnpmpackagedependencies_spark.session import load_table
    from akkastreamprocessnpmpackagedependencies_spark.streaming import pipeline as new_pl

    _materialize_old(old_ref)
    try:
        old_pl = importlib.import_module(AB_MODULE)
        work = tempfile.mkdtemp(prefix="ab_dedup_")
        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        n_rows = d.count()
        src = os.path.join(work, "src")
        for part in range(4):
            d.filter(F.col("doc_id") % 4 == part).coalesce(1).write.mode(
                "append"
            ).parquet(src)

        result = {"sf_dir": sf_dir, "rows": n_rows, "old_ref": old_ref,
                  "new_ref": subprocess.run(
                      ["git", "rev-parse", "HEAD"], cwd=REPO,
                      capture_output=True, text=True, check=True,
                  ).stdout.strip(),
                  "variants": {}}
        # interleave old/new runs so slow ambient drift hits both equally
        runs: dict[str, list] = {"old": [], "new": []}
        for rep in range(2):
            for name, mod in (("old", old_pl), ("new", new_pl)):
                corpus = os.path.join(work, f"corpus_{name}_{rep}")
                ck = os.path.join(work, f"ck_{name}_{rep}")
                secs = _run_variant(
                    spark, mod.write_dedup_gated, d.schema, src, corpus, ck
                )
                runs[name].append(secs)
        for name, secs in runs.items():
            best = min(secs)
            result["variants"][name] = {
                "runs_sec": [round(s, 3) for s in secs],
                "best_sec": round(best, 3),
                "rows_per_sec": round(n_rows / best, 1),
            }
        result["new_over_old"] = round(
            result["variants"]["new"]["best_sec"]
            / result["variants"]["old"]["best_sec"], 3,
        )
        with open(out_json, "w") as f:
            json.dump(result, f, indent=2)
            f.write("\n")
        print(json.dumps(result))
    finally:
        if os.path.exists(AB_FILE):
            os.remove(AB_FILE)


if __name__ == "__main__":
    main()
