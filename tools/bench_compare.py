"""Compare two bench JSON files per query and flag real regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio]

Accepts either a raw ``bench.py`` output line saved to a file or a
driver-recorded ``BENCH_r{N}.json`` (whose payload sits under
``parsed``). Prints every query whose median changed by more than the
ratio (default 1.5x either way) plus adds/removes, so a round's bench
deltas are triaged in one look instead of eyeballing two JSON blobs.
Exit code 0 always — this is a triage report, not a gate (deltas may be
explained methodology changes; see the PLANS.md bench-methodology
note)."""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d.get("queries", {})


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    both = sorted(set(old) & set(new))
    flagged = []
    for q in both:
        a, b = old[q], new[q]
        if a > 0 and (b / a >= ratio or (b > 0 and a / b >= ratio)):
            flagged.append((b / a, q, a, b))
    for r, q, a, b in sorted(flagged, reverse=True):
        tag = "SLOWER" if r > 1 else "faster"
        print(f"{tag:6s} {q:36s} {a:8.3f} -> {b:8.3f}  ({r:5.2f}x)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added   ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    tot_o = sum(old[q] for q in both)
    tot_n = sum(new[q] for q in both)
    rate = f"{tot_n / tot_o:.2f}x" if tot_o else "n/a"
    print(
        f"common {len(both)} queries: {tot_o:.2f}s -> {tot_n:.2f}s "
        f"({rate}); flagged >{ratio}x: {len(flagged)}"
    )


if __name__ == "__main__":
    main()
