"""Compare two bench JSON files per query and flag real regressions.

Usage: python tools/bench_compare.py OLD.json NEW.json [ratio]

Accepts either a raw ``bench.py`` output line saved to a file or a
driver-recorded ``BENCH_r{N}.json``. A driver file's payload sits under
``parsed``; when the driver's capture window truncated the line
(``parsed: null`` — BENCH_r04.json is exactly this), the loader
re-parses what it can from the ``tail`` string by scanning the longest
``"name": float`` run, so a truncated round still yields its surviving
queries instead of silently comparing nothing. Prints every query whose
median changed by more than the ratio (default 1.5x either way) plus
adds/removes, so a round's bench deltas are triaged in one look instead
of eyeballing two JSON blobs.

Noise-band suppression (round-7, after rounds 5 AND 6 each burned audit
time on phantom swings in untouched code): when BOTH files carry the
per-query ``spread`` ([min, median, max] over the measured passes,
recorded by bench.py since round 7), a median delta is flagged ONLY if
the two [min, max] bands are DISJOINT — overlapping bands mean the runs
are within each other's measured session noise, whatever the medians
say. Files without spread fall back to median-only flagging. Suppressed
overlaps are summarized so they stay auditable.

Exits non-zero only when an input yields ZERO queries — that is a broken
artifact, not an empty delta (round-4 ADVICE); explained deltas stay
exit 0 (see the PLANS.md bench-methodology note)."""

from __future__ import annotations

import json
import re
import sys


def _from_tail(tail: str) -> dict[str, float]:
    """Salvage per-query timings from a truncated capture: every
    '"name": <number>' pair inside the (possibly tail-only) queries map.
    Non-query scalar fields (value, sf, runs_per_query, n_queries) are
    filtered by name; collisions are impossible because query names
    never match them."""
    skip = {"value", "sf", "runs_per_query", "n_queries"}
    out = {}
    # anchor on the preceding '{' or ',' so a tail window that starts
    # mid-pair can't salvage a cut-off name fragment ("...ency_counts")
    # as a phantom query
    for name, num in re.findall(r'[{,]\s*"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', tail):
        if name not in skip:
            out[name] = float(num)
    return out


def load(path: str) -> tuple[dict[str, float], dict[str, list[float]]]:
    """Returns (median per query, spread per query). Spread is {} for
    pre-round-7 artifacts and truncated-tail salvage."""
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:
        if isinstance(d["parsed"], dict):
            d = d["parsed"]
        else:  # truncated driver capture: salvage from the raw tail
            qs = _from_tail(d.get("tail", ""))
            if qs:
                print(
                    f"warning: {path} has parsed=null; salvaged "
                    f"{len(qs)} queries from its tail",
                    file=sys.stderr,
                )
            return qs, {}
    return d.get("queries", {}), d.get("spread", {})


def bands_overlap(sa: list[float], sb: list[float]) -> bool:
    """True when the two [min, .., max] sample bands intersect — i.e. the
    delta is within measured session noise, not a real change."""
    return sa[0] <= sb[-1] and sb[0] <= sa[-1]


def main() -> None:
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    (old, old_sp), (new, new_sp) = load(sys.argv[1]), load(sys.argv[2])
    bad = [p for p, qs in ((sys.argv[1], old), (sys.argv[2], new)) if not qs]
    if bad:
        sys.exit(f"error: no queries parseable from: {', '.join(bad)}")
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    both = sorted(set(old) & set(new))
    flagged, suppressed = [], []
    for q in both:
        a, b = old[q], new[q]
        if (b == 0) != (a == 0):
            # a measured query can't take literally 0s on either side —
            # suspicious artifact value, not a real delta (round-4 ADVICE:
            # the b>0 guard hid the new-side case; the old-side case is
            # the same disease in OLD.json)
            flagged.append((0.0, q, a, b))
        elif a > 0 and (b / a >= ratio or (b > 0 and a / b >= ratio)):
            if q in old_sp and q in new_sp and bands_overlap(old_sp[q], new_sp[q]):
                suppressed.append((b / a, q, a, b))
            else:
                flagged.append((b / a, q, a, b))
    for r, q, a, b in sorted(flagged, reverse=True):
        tag = "ZERO??" if (b == 0) != (a == 0) else ("SLOWER" if r > 1 else "faster")
        band = ""
        if q in old_sp and q in new_sp:
            band = (
                f"  bands [{old_sp[q][0]:.2f},{old_sp[q][-1]:.2f}] vs "
                f"[{new_sp[q][0]:.2f},{new_sp[q][-1]:.2f}]"
            )
        print(f"{tag:6s} {q:36s} {a:8.3f} -> {b:8.3f}  ({r:5.2f}x){band}")
    for r, q, a, b in sorted(suppressed, reverse=True):
        print(
            f"noise  {q:36s} {a:8.3f} -> {b:8.3f}  ({r:5.2f}x) "
            f"within overlapping spread bands — not flagged"
        )
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
        + (f"; noise-suppressed: {len(suppressed)}" if suppressed else "")
    )


if __name__ == "__main__":
    main()
