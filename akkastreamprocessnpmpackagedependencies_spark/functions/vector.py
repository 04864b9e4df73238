"""Vector math over ``array<float>`` / ``array<double>`` columns, as pure
column expressions (higher-order functions — JVM codegen, no UDF).

Determinism note: double addition is order-dependent and DuckDB's compiled
fold may fuse multiply-adds, so cross-engine dot products can differ by
1 ulp. All similarity values surfaced in query output are ROUNDED to 6
decimals; thresholds and rank boundaries in the data sit far (>1e-3) from
any 1-ulp edge.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: sum_i a[i]*b[i]."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def sql_dot(a: str, b: str, dim: int) -> str:
    """DuckDB mirror of ``dot`` (1-indexed lists, sequential list_reduce).
    Operands are parenthesized so literal-list casts index correctly."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> ({a})[i]*({b})[i]), (x, y) -> x + y)"
    )


def sql_cosine(a: str, b: str, dim: int) -> str:
    return (
        f"({sql_dot(a, b, dim)}) / "
        f"(sqrt({sql_dot(a, a, dim)}) * sqrt({sql_dot(b, b, dim)}))"
    )


def lsh_bucket(v: Column, planes: list[list[float]]) -> Column:
    """Sign-random-projection bucket id: bit j = (v . plane_j) > 0.
    With P planes this maps each vector into one of 2^P buckets; at scale
    the bucket id is the shuffle/cluster key, so candidate generation is an
    equi-join instead of a cross join."""
    bits = [
        F.when(dot(v, F.array(*[F.lit(x) for x in p])) > 0, F.lit(1 << j)).otherwise(F.lit(0))
        for j, p in enumerate(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def sql_lsh_bucket(v: str, planes: list[list[float]], dim: int) -> str:
    parts = []
    for j, p in enumerate(planes):
        lit = "[" + ", ".join(f"{x:.3f}" for x in p) + "]::DOUBLE[]"
        parts.append(f"(CASE WHEN ({sql_dot(v, lit, dim)}) > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(parts)
