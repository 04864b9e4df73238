"""Same-session A/B adjudication for ``simhash_candidate_pairs``
(round-10 verdict #4: it drifted 2.60 -> 3.77 s raw between rounds on
UNTOUCHED code — prove ambient drift or find the regression).

The ``tools/ab_dedup_gate.py`` pattern: the OLD variant of
``operators/dedup.py`` is materialized from git history into the
package (so its relative imports resolve), and the two variants run the
same query on the same data INTERLEAVED in one session, so ambient
FS/JVM drift hits both arms equally. Timing mirrors bench.py's
``run_once``: construction included, result to the noop sink.

Usage: python tools/ab_simhash.py [old_ref] [sf_dir] [out_json]
Defaults: b0c7154 (the round-9 bench commit whose 2.60 s is the
comparison point), sf0.1, BENCH_AB_simhash.json in the repo root.
"""

from __future__ import annotations

import importlib
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
PKG = "akkastreamprocessnpmpackagedependencies_spark"
MODULE_REL = f"{PKG}/operators/dedup.py"
AB_MODULE = f"{PKG}.operators._dedup_ab_old"
AB_FILE = os.path.join(REPO, PKG, "operators", "_dedup_ab_old.py")
RUNS_PER_VARIANT = 4


def _materialize_old(ref: str) -> None:
    src = subprocess.run(
        ["git", "show", f"{ref}:{MODULE_REL}"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    with open(AB_FILE, "w") as f:
        f.write(src)


def main() -> None:
    old_ref = sys.argv[1] if len(sys.argv) > 1 else "b0c7154"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    out_json = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "BENCH_AB_simhash.json"
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from akkastreamprocessnpmpackagedependencies_spark.operators import dedup as new_mod

    _materialize_old(old_ref)
    try:
        old_mod = importlib.import_module(AB_MODULE)

        def run_once(mod) -> float:
            t0 = time.perf_counter()
            mod.simhash_candidate_pairs(spark, sf_dir).write.format(
                "noop"
            ).mode("overwrite").save()
            return time.perf_counter() - t0

        # warmup both codepaths (JVM codegen, python worker pool, file
        # index) before any measured pass
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        run_once(old_mod)
        run_once(new_mod)

        runs: dict[str, list[float]] = {"old": [], "new": []}
        for rep in range(RUNS_PER_VARIANT):
            # alternate which arm goes first so slot-in-pass bias cancels
            order = (
                [("old", old_mod), ("new", new_mod)]
                if rep % 2 == 0
                else [("new", new_mod), ("old", old_mod)]
            )
            for name, mod in order:
                runs[name].append(run_once(mod))

        result = {
            "query": "simhash_candidate_pairs",
            "sf_dir": sf_dir,
            "old_ref": old_ref,
            "new_ref": subprocess.run(
                ["git", "rev-parse", "HEAD"], cwd=REPO,
                capture_output=True, text=True, check=True,
            ).stdout.strip(),
            "runs_per_variant": RUNS_PER_VARIANT,
            "variants": {
                name: {
                    "runs_sec": [round(s, 3) for s in secs],
                    "median_sec": round(statistics.median(secs), 3),
                    "best_sec": round(min(secs), 3),
                }
                for name, secs in runs.items()
            },
        }
        result["new_over_old_median"] = round(
            result["variants"]["new"]["median_sec"]
            / result["variants"]["old"]["median_sec"], 3,
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
