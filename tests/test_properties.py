"""Property-based tests (hypothesis) for the pure column-expression
function library — the pieces every dedup/similarity operator builds on.
Each example round-trips through a real Spark job, so example counts are
kept small; the properties (not the volume) carry the weight."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from akkastreamprocessnpmpackagedependencies_spark.functions.text import (
    char_shingles,
    minhash_affine,
    base_hashes,
    word_shingles,
)
from akkastreamprocessnpmpackagedependencies_spark.functions.vector import cosine

_settings = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

_words = st.lists(st.text(alphabet="abcdefg", min_size=1, max_size=4), min_size=1, max_size=12)


@given(ws=_words)
@_settings
def test_word_shingles_match_python_set(spark, ws):
    text = " ".join(ws)
    [row] = (
        spark.createDataFrame([(text,)], "text string")
        .select(word_shingles(F.col("text")).alias("sh"))
        .collect()
    )
    n = len(ws)
    if n >= 3:
        want = {" ".join(ws[i : i + 3]) for i in range(n - 2)}
    else:
        want = {" ".join(ws)}
    assert set(row.sh) == want


@given(s=st.text(alphabet="abcdef ", min_size=1, max_size=24))
@_settings
def test_char_shingles_match_python_set(spark, s):
    [row] = (
        spark.createDataFrame([(s,)], "text string")
        .select(char_shingles(F.col("text")).alias("g"))
        .collect()
    )
    want = {s[i : i + 4] for i in range(len(s) - 3)} if len(s) >= 4 else {s}
    assert set(row.g) == want


@given(ws=_words)
@_settings
def test_minhash_is_order_invariant_and_monotone(spark, ws):
    """The minhash of a shingle SET must not depend on token-set order, and
    adding shingles can only lower (never raise) the min."""
    text = " ".join(ws)
    df = spark.createDataFrame([(text,)], "text string")
    sig = df.select(
        *[
            minhash_affine(base_hashes(word_shingles(F.col("text"))), h).alias(f"m{h}")
            for h in range(4)
        ]
    )
    [a] = sig.collect()
    # reversed token order changes the shingle LIST but the min over any
    # superset-equal base set of a permuted text's own shingles is stable
    [b] = (
        spark.createDataFrame([(text,)], "text string")
        .select(
            *[
                minhash_affine(
                    F.reverse(base_hashes(word_shingles(F.col("text")))), h
                ).alias(f"m{h}")
                for h in range(4)
            ]
        )
        .collect()
    )
    assert tuple(a) == tuple(b)
    extended = " ".join(ws + ["zz"])
    [c] = (
        spark.createDataFrame([(extended,)], "text string")
        .select(
            *[
                minhash_affine(base_hashes(word_shingles(F.col("text"))), h).alias(f"m{h}")
                for h in range(4)
            ]
        )
        .collect()
    )
    if len(ws) >= 3:  # extension adds shingles without removing any
        for got, prev in zip(tuple(c), tuple(a)):
            assert got <= prev


@given(
    v=st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False), min_size=4, max_size=8)
)
@_settings
def test_cosine_self_similarity(spark, v):
    import math

    if math.sqrt(sum(x * x for x in v)) < 1e-6:
        return
    df = spark.createDataFrame([(v, v)], "a array<double>, b array<double>")
    [row] = df.select(cosine(F.col("a"), F.col("b")).alias("c")).collect()
    assert abs(row.c - 1.0) < 1e-9
