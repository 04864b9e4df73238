"""Text decomposition helpers: tokens, word/char shingles, md5-based
minhash. Pure column expressions.

Hash convention: ``md5(seed || ':' || shingle)`` produces identical
lowercase 32-hex strings in Spark and DuckDB, and fixed-length hex compares
lexicographically exactly like the underlying 128-bit integer — so
``min(md5(...))`` IS a minhash without any hex->int conversion (which the
two engines do NOT share a builtin for).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: Column) -> Column:
    return F.split(text, " ")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Distinct k-word shingles. Docs shorter than k tokens contribute the
    whole text as a single shingle (so every doc has a non-empty set)."""
    t = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(t) - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(t, i, k)),
    )
    return F.array_distinct(grams)


def char_shingles(text: Column, k: int = 4) -> Column:
    """Distinct k-char shingles."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1))),
        lambda i: F.substring(text, i, k),
    )
    return F.array_distinct(grams)


def minhash(shingles: Column, seed: int) -> Column:
    """One minhash: lexicographic min of seeded md5 hex over the set."""
    return F.array_min(F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s))))


def sql_word_shingles(text: str, k: int = 3) -> str:
    t = f"string_split({text}, ' ')"
    return (
        f"list_distinct(list_transform(range(1, greatest(len({t}) - {k - 1}, 1) + 1), "
        f"i -> array_to_string(list_slice({t}, i, i + {k - 1}), ' ')))"
    )


def sql_char_shingles(text: str, k: int = 4) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(length({text}) - {k - 1}, 1) + 1), "
        f"i -> substr({text}, i, {k})))"
    )


def sql_minhash(shingles: str, seed: int) -> str:
    return f"list_min(list_transform({shingles}, s -> md5('{seed}:' || s)))"
