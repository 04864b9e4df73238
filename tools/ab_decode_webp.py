"""Same-session A/B adjudication for ``multimodal_decode_webp``
(round 11): the verify gate's cross-artifact comparison flags it
~1.7x over round 10 — but the comparison normalizes by a JVM
calibration that cannot see Python-worker time, and this query is
entirely Arrow-batched Python. This isolates the CODE-ATTRIBUTABLE
delta in one session: the round-10 shape rotation (3 VP8L bitstream
shapes per doc) vs the round-11 rotation (5 shapes — predictor and
subtract-green+predictor+cross-color added), both through the CURRENT
codec, interleaved on the same data. The expected honest answer is
~1.2-1.4x: the two added shapes simply do more work per document —
that is the coverage being purchased, not a regression in the shared
code (modes 0-2 are byte-identical bitstreams in both arms).

Usage: python tools/ab_decode_webp.py [sf_dir] [out_json]
Defaults: sf0.1, BENCH_AB_decode_webp.json in the repo root.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time
from collections.abc import Iterator

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
RUNS_PER_VARIANT = 4


def _decode_query(n_shapes: int):
    """The registered query's mapInPandas body, parameterized ONLY by the
    shape-rotation modulus (3 = the round-10 rotation, 5 = round-11).
    Kept textually in sync with operators/multimodal.py's
    multimodal_decode_webp — the A/B is about the rotation, so both arms
    must share every other line."""
    import pandas as pd
    from pyspark.sql import functions as F

    from akkastreamprocessnpmpackagedependencies_spark.operators.multimodal import (
        _DECODE_SCHEMA,
    )
    from akkastreamprocessnpmpackagedependencies_spark.session import load_table

    def q(spark, sf_dir):
        d = load_table(spark, sf_dir, "documents").filter(
            (F.length("text") > 0) & (F.length("text") == F.octet_length("text"))
        )

        def _encode_decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from akkastreamprocessnpmpackagedependencies_spark.functions.webp import (
                decode_webp,
                encode_webp,
            )

            modes = [
                dict(use_lz77=False, cache_bits=0),
                dict(use_lz77=True, cache_bits=0),
                dict(use_lz77=True, cache_bits=6, subtract_green=True),
                dict(use_lz77=True, cache_bits=0, predictor=True,
                     transform_bits=2),
                dict(use_lz77=True, cache_bits=4, subtract_green=True,
                     predictor=True, cross_color=True, transform_bits=2),
            ][:n_shapes]
            for pdf in batches:
                out = {k: [] for k in (
                    "doc_id", "width", "height", "channels", "mean_intensity")}
                for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                    w = int(4 + doc_id % 13)
                    h = int(3 + doc_id % 11)
                    n = w * h * 3
                    body = text.encode("ascii").ljust(n, b"x")[:n]
                    payload = encode_webp(w, h, body, 3,
                                          **modes[int(doc_id) % n_shapes])
                    dw, dh, dc, arr = decode_webp(payload)
                    out["doc_id"].append(int(doc_id))
                    out["width"].append(dw)
                    out["height"].append(dh)
                    out["channels"].append(dc)
                    out["mean_intensity"].append(
                        float(int(arr.sum(dtype="int64"))) / arr.size
                    )
                yield pd.DataFrame(out)

        return d.select("doc_id", "text").mapInPandas(
            _encode_decode, schema=_DECODE_SCHEMA
        )

    return q


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "BENCH_AB_decode_webp.json"
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
    arms = {"r10_3shapes": _decode_query(3), "r11_5shapes": _decode_query(5)}

    def run_once(q) -> float:
        t0 = time.perf_counter()
        q(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for q in arms.values():
        run_once(q)  # warm both codepaths before any measured pass

    runs: dict[str, list[float]] = {name: [] for name in arms}
    for rep in range(RUNS_PER_VARIANT):
        order = list(arms.items())
        if rep % 2:
            order.reverse()  # alternate arm order: slot bias cancels
        for name, q in order:
            runs[name].append(run_once(q))

    result = {
        "query": "multimodal_decode_webp (shape-rotation A/B, current codec)",
        "sf_dir": sf_dir,
        "ref": subprocess.run(
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
    result["r11_over_r10_median"] = round(
        result["variants"]["r11_5shapes"]["median_sec"]
        / result["variants"]["r10_3shapes"]["median_sec"], 3,
    )
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
