"""Deep conformance fuzz for the pure-Python VP8 keyframe decoder
(functions/vp8.py) against the system libwebp — the committed-harness
companion to tests/test_vp8.py's matrix, at fuzz scale.

Every case encodes a deterministic image with libwebp's REAL encoder
(segmentation, loop-filter levels, token-probability updates, skip
decisions all chosen by a production encoder) and requires the pure
decoder's Y/U/V planes to match libwebp's decoder BIT-EXACTLY. Case i
reproduces from ``default_rng(i)`` alone, so any failure is one command
away from a minimal repro.

Coverage axes per case: width/height 8..128 (both MB-aligned and not),
quality 5..100 (drives quantizer indices, segment counts, filter
levels, B_PRED density), three raster families (uniform noise —
worst-case token density; smooth gradient — skip/DC-heavy; quantized
bands — structured edges, the loop filter's favorite).

Usage: python tools/fuzz_vp8_conformance.py [n_cases] [out_json]
Default 1500 cases -> FUZZ_vp8_conformance.json in the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from akkastreamprocessnpmpackagedependencies_spark.functions import vp8 as V  # noqa: E402
from akkastreamprocessnpmpackagedependencies_spark.functions import webplib as wl  # noqa: E402


def one_case(i: int) -> dict:
    rng = np.random.default_rng(i)
    w = int(rng.integers(8, 129))
    h = int(rng.integers(8, 129))
    q = int(rng.integers(5, 101))
    family = i % 3
    if family == 0:
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
    elif family == 1:
        x = np.linspace(0, 255, w)[None, :] + np.linspace(
            0, float(rng.integers(10, 120)), h
        )[:, None]
        img = np.stack([x, x[::-1], 0.35 * x], -1).astype(np.uint8)
    else:
        g = ((np.indices((h, w)).sum(0) % int(rng.integers(5, 40))) * 9).astype(np.uint8)
        img = np.stack([g, 255 - g, g], -1)
    data = wl.encode_rgb(np.ascontiguousarray(img), q)
    rw, rh, ry, ru, rv = wl.decode_yuv(data)
    mw, mh, my_, mu, mv = V.decode_webp_vp8(data)
    ok = (
        (mw, mh) == (rw, rh)
        and np.array_equal(my_, ry)
        and np.array_equal(mu, ru)
        and np.array_equal(mv, rv)
    )
    return {
        "case": i, "w": w, "h": h, "q": q, "family": family,
        "bytes": len(data), "exact": bool(ok),
    }


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1500
    out_json = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        REPO, "FUZZ_vp8_conformance.json"
    )
    if not wl.available():
        sys.exit("system libwebp not present; the harness has no oracle")
    t0 = time.perf_counter()
    failures = []
    fam_counts = [0, 0, 0]
    total_bytes = 0
    for i in range(n):
        r = one_case(i)
        fam_counts[r["family"]] += 1
        total_bytes += r["bytes"]
        if not r["exact"]:
            failures.append(r)
        if (i + 1) % 250 == 0:
            print(f"{i + 1}/{n} cases, {len(failures)} failures", flush=True)
    wall = time.perf_counter() - t0
    result = {
        "harness": "vp8 keyframe decoder vs libwebp, bit-exact YUV",
        "cases": n,
        "families": {"noise": fam_counts[0], "gradient": fam_counts[1],
                     "banded": fam_counts[2]},
        "size_range": [8, 128], "quality_range": [5, 100],
        "total_encoded_bytes": total_bytes,
        "failures": failures,
        "n_failures": len(failures),
        "wall_sec": round(wall, 1),
        "reproduce": "python tools/fuzz_vp8_conformance.py; case i regenerates from default_rng(i)",
    }
    with open(out_json, "w") as f:
        json.dump(result, f, indent=2)
        f.write("\n")
    print(
        f"{n} cases in {wall:.0f}s: {len(failures)} failures -> {out_json}"
    )
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
