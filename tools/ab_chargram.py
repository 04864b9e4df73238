"""Same-session interleaved A/B adjudication for
``chargram_jaccard_pairs`` (round-12 verdict #1: raw 3.60 -> 5.89 s
r11->r12 with NON-overlapping spread bands on code untouched since
round 9, unexplained by either the JVM or the pyworker calibration).

The code-identity question is settled by git, not by timing:
``operators/dedup.py`` at HEAD is blob-compared against the round-11
and round-12 artifact commits and the result is recorded — if the
blobs are equal there is no old-vs-new code to race, so the open
question is WHAT THE QUERY COSTS IN A QUIET SESSION under bench.py's
own session settings (``get_spark``: local[$SPARK_GRAFT_CPUS], AQE on)
and bench.py's own timing span (construction + noop sink). History
precedent: this exact query flagged in round 7 as in-suite neighbor
interference (PLANS.md) — a standalone median back at the r11 level
adjudicates the r12 movement as the same class.

The round-12 verdict's one mechanical suspect — AQE partition
decisions interacting with the pinned verify-join repartition
(``_banded_pairs`` ``pin_partitions``) — gets its own arm: the same
query body with the pin REMOVED runs interleaved with the real
registered query, alternating which arm goes first each rep so
slot-in-pass bias cancels. Both arms' result row-sets are asserted
identical once (the pin only shapes partitioning, never values).

Usage: python tools/ab_chargram.py [sf_dir] [out_json]
Defaults: sf0.1, BENCH_AB_chargram.json in the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODULE_REL = "akkastreamprocessnpmpackagedependencies_spark/operators/dedup.py"
# the commits whose committed artifacts carry the 3.60 s (r11) and
# 5.89 s (r12) chargram medians
REF_COMMITS = {"r11": "32879cf", "r12": "39dab66"}
RUNS_PER_VARIANT = 5


def _blob(ref: str) -> str:
    return subprocess.run(
        ["git", "rev-parse", f"{ref}:{MODULE_REL}"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout.strip()


def _artifact_median(ref_path: str) -> float | None:
    """Median from an artifact PINNED at a commit (``<ref>:<file>``) —
    never the working-tree file, which later rounds overwrite in place
    (review finding: a re-run at a newer HEAD would otherwise record a
    newer round's median under the r12 label).

    The pinned refs are FIXED INPUTS, not optional context (round-13
    ADVICE): a typo'd ref or an unparseable artifact raises instead of
    silently recording a null context median under a complete-looking
    verdict JSON. Only a genuinely absent query key returns None — and
    says so on stderr."""
    raw = subprocess.run(
        ["git", "show", ref_path], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout
    d = json.loads(raw)
    if "parsed" in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    med = d.get("queries", {}).get("chargram_jaccard_pairs")
    if med is None:
        print(
            f"note: {ref_path} parsed but carries no "
            "chargram_jaccard_pairs median (query absent from that "
            "artifact's compact line); context median recorded as null",
            file=sys.stderr,
        )
    return med


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_AB_chargram.json"
    )
    from pyspark.sql import functions as F

    from akkastreamprocessnpmpackagedependencies_spark.operators import dedup as dd
    from akkastreamprocessnpmpackagedependencies_spark.session import get_spark

    spark = get_spark("ab_chargram")
    spark.sparkContext.setLogLevel("ERROR")

    def nopin_variant(spark, sf_dir):
        """chargram_jaccard_pairs body with pin_partitions=None: the
        verify join's parallelism is left to AQE's byte-based coalesce
        (the round-12 verdict's suspect)."""
        d = dd.load_scaled(spark, sf_dir, "documents")
        sig = (
            d.select("doc_id", dd.char_shingles(F.col("text")).alias("g"))
            .withColumn("bases", dd.base_hashes(F.col("g")))
            .select(
                "doc_id",
                F.array_distinct(F.col("bases")).alias("hb"),
                *[
                    dd.minhash_affine(F.col("bases"), h).alias(f"mh{h}")
                    for h in range(dd.N_HASHES)
                ],
            )
            .persist()
        )
        pairs = dd._banded_pairs(sig, "hb", dd.CHARGRAM_JACCARD).transform(
            dd.ckpt
        )
        sig.unpersist()
        return pairs

    def run_once(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # result parity between arms (the pin shapes partitioning only)
    got_pin = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in dd.chargram_jaccard_pairs(spark, sf_dir).collect()
    }
    got_nopin = {
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in nopin_variant(spark, sf_dir).collect()
    }
    assert got_pin == got_nopin, "arms disagree on the pair set"

    # warmup both codepaths (JVM codegen, file index) before measuring
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    run_once(dd.chargram_jaccard_pairs)
    run_once(nopin_variant)

    runs: dict[str, list[float]] = {"pinned": [], "nopin": []}
    for rep in range(RUNS_PER_VARIANT):
        order = (
            [("pinned", dd.chargram_jaccard_pairs), ("nopin", nopin_variant)]
            if rep % 2 == 0
            else [("nopin", nopin_variant), ("pinned", dd.chargram_jaccard_pairs)]
        )
        for name, fn in order:
            runs[name].append(run_once(fn))

    head = subprocess.run(
        ["git", "rev-parse", "HEAD"], cwd=REPO,
        capture_output=True, text=True, check=True,
    ).stdout.strip()
    result = {
        "query": "chargram_jaccard_pairs",
        "sf_dir": sf_dir,
        "head": head,
        "code_identity": {
            ref: {
                "commit": c,
                "dedup_blob_equal_to_head": _blob(c) == _blob("HEAD"),
            }
            for ref, c in REF_COMMITS.items()
        },
        "context_medians_sec": {
            "r11_in_suite": _artifact_median(
                f"{REF_COMMITS['r11']}:BENCH_r11.json"
            ),
            "r12_in_suite": _artifact_median(
                f"{REF_COMMITS['r12']}:BENCH_FULL.json"
            ),
        },
        "runs_per_variant": RUNS_PER_VARIANT,
        "pairs": len(got_pin),
        "variants": {
            name: {
                "runs_sec": [round(s, 3) for s in secs],
                "median_sec": round(statistics.median(secs), 3),
                "best_sec": round(min(secs), 3),
            }
            for name, secs in runs.items()
        },
    }
    result["nopin_over_pinned_median"] = round(
        result["variants"]["nopin"]["median_sec"]
        / result["variants"]["pinned"]["median_sec"], 3,
    )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
