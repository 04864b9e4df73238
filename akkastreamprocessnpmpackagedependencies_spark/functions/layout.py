"""Z-order (Morton) curve keys as pure integer column expressions, with a
character-for-character DuckDB SQL mirror — the multi-dimensional
clustering key behind Delta/Iceberg's Z-ORDER layout optimization.

Why: range-clustering a file layout on ONE column (io.write_sorted_for_
zone_maps) makes parquet min/max stats selective for that column only; a
predicate on a second column still scans everything. Interleaving the bits
of two (or more) dimensions into one sort key gives every file a small
rectangle of the multi-dim key space, so zone maps prune on EITHER
dimension. Everything here is shifts/masks/ors on BIGINT — bit-identical
across engines, no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# classic 16->32 bit "spread" constants: after the sequence, bit i of the
# input sits at bit 2i of the output
_SPREAD = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]

MORTON_MASK = 0xFFFF  # dimensions are clamped to 16 bits


def _spread_bits(x: Column) -> Column:
    for shift, mask in _SPREAD:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_key(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of two non-negative integer columns into
    a 32-bit Morton key (x in even bits, y in odd)."""
    xs = _spread_bits(x.cast("long").bitwiseAND(F.lit(MORTON_MASK)))
    ys = _spread_bits(y.cast("long").bitwiseAND(F.lit(MORTON_MASK)))
    return xs.bitwiseOR(F.shiftleft(ys, 1))


def _sql_spread(expr: str) -> str:
    for shift, mask in _SPREAD:
        expr = f"(({expr} | ({expr} << {shift})) & {mask})"
    return expr


def sql_morton_key(x: str, y: str) -> str:
    """DuckDB mirror of :func:`morton_key` — identical shift/mask sequence
    on BIGINT."""
    xs = _sql_spread(f"(CAST({x} AS BIGINT) & {MORTON_MASK})")
    ys = _sql_spread(f"(CAST({y} AS BIGINT) & {MORTON_MASK})")
    return f"({xs} | ({ys} << 1))"
