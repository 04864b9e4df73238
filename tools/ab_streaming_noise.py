"""Adjudicate streaming-sink rows/s movement between two bench
artifacts as REAL vs AMBIENT — the ab_chargram discipline applied to
the streaming surface (round 14: the r13->r14 compare showed three
sketch sinks ~1.8x slower AND three siblings ~2x faster in the same
session, on untouched operator code — the mixed-direction signature of
micro-batch scheduling noise; this harness turns that inference into a
measured band).

Method: run the per-round bench's OWN streaming measurement
(``bench.bench_streaming`` — same file slicing, same noop sink, same
progress accounting) R times in one quiet session, record each op's
cross-run [min, median, max] rows/s band. The decisive test exploits
that the quiet runs execute the CURRENT code: a code regression would
cap the quiet median below the old artifact's throughput, so an op is
REAL-regressed only when ``quiet_median < old_value / 1.5`` (the
compare's own flag ratio). Artifact one-shot values falling OUTSIDE
the quiet band are reported informationally — each gate-run artifact
records a single streaming pass, and a one-shot below the band says
that SESSION's pass was degraded (ambient), not that the code is
slower; absolute rows/s are not comparable across sessions, which is
the entire reason the batch side carries calibration twins.

Usage: python tools/ab_streaming_noise.py OLD NEW [out_json]
where OLD/NEW are artifact paths or ``<gitrev>:<path>`` specs (pinned
at a commit, the ab_chargram discipline — the working-tree BENCH_FULL
is overwritten in place by later rounds, so a committed adjudication
must name the revision it compared). They are fixed inputs; an
unreadable path or unresolvable rev raises (round-13 ADVICE: never a
silent null in a complete-looking verdict JSON).
Output: BENCH_AB_streaming_noise.json in the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

RUNS = 3
SLACK = 0.15  # informational band widened 15% each way
FLAG_RATIO = 1.5  # the compare's own regression threshold


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit("usage: ab_streaming_noise.py OLD.json NEW.json [out.json]")
    old_path, new_path = sys.argv[1], sys.argv[2]
    out_json = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        REPO, "BENCH_AB_streaming_noise.json"
    )
    def load_streaming(spec: str) -> dict:
        """Artifact path, or ``<gitrev>:<path>`` pinned via git show.
        Fixed inputs: unreadable/unresolvable raises."""
        if ":" in spec and not os.path.exists(spec):
            raw = subprocess.run(
                ["git", "show", spec], cwd=REPO,
                capture_output=True, text=True, check=True,
            ).stdout
            return json.loads(raw)["streaming"]
        with open(spec) as f:
            return json.load(f)["streaming"]

    old = load_streaming(old_path)
    new = load_streaming(new_path)

    from pyspark.sql import SparkSession

    import bench

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    samples: dict[str, list[float]] = {}
    for _ in range(RUNS):
        run = bench.bench_streaming(spark, sf_dir)
        for op, rec in run.items():
            if rec.get("rows_per_sec"):
                samples.setdefault(op, []).append(float(rec["rows_per_sec"]))

    verdicts: dict[str, dict] = {}
    regressed: list[str] = []
    for op, vals in sorted(samples.items()):
        band = [min(vals), statistics.median(vals), max(vals)]
        lo, hi = band[0] * (1 - SLACK), band[2] * (1 + SLACK)

        def _in(side: dict | None) -> bool | None:
            if not side or not side.get("rows_per_sec"):
                return None
            return lo <= float(side["rows_per_sec"]) <= hi

        old_v = (old.get(op) or {}).get("rows_per_sec")
        is_reg = old_v is not None and band[1] < float(old_v) / FLAG_RATIO
        verdicts[op] = {
            "quiet_band_rows_per_sec": [round(v) for v in band],
            "old_value": old_v,
            "old_oneshot_inside_band": _in(old.get(op)),
            "new_value": (new.get(op) or {}).get("rows_per_sec"),
            "new_oneshot_inside_band": _in(new.get(op)),
            "current_code_regressed_vs_old": is_reg,
        }
        if is_reg:
            regressed.append(op)

    result = {
        "method": (
            f"{RUNS} full quiet-session streaming passes of the CURRENT "
            f"code; an op is regressed only if its quiet median cannot "
            f"reach old_value/{FLAG_RATIO}; one-shot band checks "
            f"(+/-{SLACK:.0%}) are informational"
        ),
        "old_artifact": old_path,
        "new_artifact": new_path,
        "ops": verdicts,
        "regressed": regressed,
        "conclusion": (
            "the current code's quiet medians reach every old artifact "
            "value -> the compare's streaming flags are one-shot ambient "
            "scheduling noise, not code regressions"
            if not regressed
            else f"REAL regressions (quiet median below old/"
                 f"{FLAG_RATIO}): {regressed}"
        ),
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps({k: result[k] for k in ("regressed", "conclusion")}))


if __name__ == "__main__":
    main()
