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


@given(
    toks=st.lists(st.integers(min_value=1, max_value=5000), min_size=1, max_size=20),
    gap=st.integers(min_value=1, max_value=3000),
    budget=st.sampled_from([1, 7, 128]),
)
@_settings
def test_pack_token_counts_matches_serial_chunking(spark, toks, gap, budget):
    """The sharded prefix sum must equal the serial concat-then-chunk walk
    for ANY id spacing (gapped ids exercise empty shards and shard
    boundaries) and any budget, including docs many budgets long.
    n_tokens >= 1 is the operator's domain: split() never yields an empty
    token list, in either engine."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.quality import (
        pack_token_counts,
    )

    ids = [i * gap for i in range(len(toks))]
    df = spark.createDataFrame(
        list(zip(ids, toks)), "doc_id long, n_tokens long"
    )
    got = {
        r.doc_id: (r.start_seq, r.start_offset, r.end_seq)
        for r in pack_token_counts(df, budget=budget, shard_size=4).collect()
    }
    cum = 0
    for i, n in zip(ids, toks):
        assert got[i] == (cum // budget, cum % budget, (cum + n - 1) // budget)
        cum += n


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 24), st.integers(0, 24)), min_size=1, max_size=40
    )
)
@_settings
def test_cc_alternating_star_matches_union_find(spark, edges):
    """Alternating large-star/small-star equals a serial union-find on
    arbitrary graphs (self-loops, duplicate and reversed edges included):
    every node labels to its component minimum."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.dedup import (
        cc_alternating_star,
    )

    real = [(a, b) for a, b in edges if a != b]
    if not real:
        return
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in real:
        parent[find(a)] = find(b)
    want = {}
    comp_min: dict[int, int] = {}
    for n in parent:
        comp_min[find(n)] = min(comp_min.get(find(n), n), n)
    for n in parent:
        want[n] = comp_min[find(n)]

    pairs = spark.createDataFrame(real, "doc_a long, doc_b long")
    labels, _ = cc_alternating_star(pairs)
    got = {r.id: r.lbl for r in labels.collect()}
    assert got == want
