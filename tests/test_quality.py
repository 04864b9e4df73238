"""Invariant tests for the corpus-quality surface (operators/quality.py).

Cross-engine value equality is the driver's oracle gate; these tests pin
the semantic invariants that hold for ANY corpus, so a refactor that keeps
the oracle in lockstep but breaks the math still fails fast."""

from __future__ import annotations

from pyspark.sql import functions as F

from akkastreamprocessnpmpackagedependencies_spark.operators.quality import (
    embedding_quantize_int8,
    fuzzy_dedup_keep_one,
    quality_filter_composite,
    repetition_signals,
    semdedup_keep_one,
    top_bigram_share,
)
from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import (
    embedding_neardup_pairs,
)
from akkastreamprocessnpmpackagedependencies_spark.session import load_table


def test_repetition_signals_bounds(spark, sf_dir):
    df = repetition_signals(spark, sf_dir)
    bad = df.filter(
        (F.col("n_distinct_words") > F.col("n_words"))
        | (F.col("dup_word_frac") < 0)
        | (F.col("dup_word_frac") > 1)
        | (F.col("dup_trigram_frac") < 0)
        | (F.col("dup_trigram_frac") > 1)
    ).count()
    assert bad == 0
    assert df.count() == load_table(spark, sf_dir, "documents").count()


def test_repetition_signals_detects_repeats(spark, tmp_path):
    """A fully-repeated synthetic doc must score high, an all-unique doc 0."""
    spark.createDataFrame(
        [(1, "x x x x x x"), (2, "a b c d e f")], ["doc_id", "text"]
    ).coalesce(1).write.parquet(str(tmp_path / "documents.parquet"))
    out = repetition_signals(spark, str(tmp_path)).collect()
    frac = {r.doc_id: r.dup_word_frac for r in out}
    tri = {r.doc_id: r.dup_trigram_frac for r in out}
    assert frac[1] > 0.8 and frac[2] == 0.0
    assert tri[1] > 0.7 and tri[2] == 0.0


def test_top_bigram_share_bounds(spark, sf_dir):
    df = top_bigram_share(spark, sf_dir)
    assert (
        df.filter(
            (F.col("top_bigram_share") <= 0)
            | (F.col("top_bigram_share") > 1)
            | (F.col("top_count") > F.col("n_bigrams"))
        ).count()
        == 0
    )
    # one row per doc with >= 2 words
    assert df.groupBy("doc_id").count().filter("count > 1").count() == 0


def test_quality_filter_keep_is_flag_conjunction(spark, sf_dir):
    df = quality_filter_composite(spark, sf_dir)
    bad = df.filter(
        F.col("keep")
        != (F.col("len_ok") & F.col("word_len_ok") & F.col("stopword_ok") & F.col("lang_ok"))
    ).count()
    assert bad == 0


def test_fuzzy_dedup_keep_one_covers_corpus(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    df = fuzzy_dedup_keep_one(spark, sf_dir).cache()
    try:
        assert df.count() == docs.count()
        # canonical is the component minimum -> never larger than the member
        assert df.filter(F.col("canonical_id") > F.col("doc_id")).count() == 0
        # keep <=> the doc IS its canonical
        assert df.filter(F.col("keep") != (F.col("canonical_id") == F.col("doc_id"))).count() == 0
        # every canonical survives
        kept = {r.doc_id for r in df.filter("keep").collect()}
        canon = {r.canonical_id for r in df.collect()}
        assert canon <= kept
    finally:
        df.unpersist()


def test_semdedup_drops_exactly_the_pair_losers(spark, sf_dir):
    losers = {
        r.vec_b for r in embedding_neardup_pairs(spark, sf_dir).select("vec_b").collect()
    }
    df = semdedup_keep_one(spark, sf_dir)
    dropped = {r.vec_id for r in df.filter(~F.col("keep")).collect()}
    assert dropped == losers
    assert df.count() == load_table(spark, sf_dir, "embeddings").count()


def test_quantize_int8_error_bound(spark, sf_dir):
    """round() guarantees |x*scale - code| <= 0.5 code units; scale > 0 and
    the max element must map to exactly +-127."""
    df = embedding_quantize_int8(spark, sf_dir).cache()
    try:
        assert df.filter(F.col("scale") <= 0).count() == 0
        assert df.filter(F.col("max_scaled_err") > 0.5000001).count() == 0
        assert df.filter(F.col("n_dims") != 64).count() == 0
    finally:
        df.unpersist()


def test_pack_sequences_is_exact_stream_chunking(spark, sf_dir):
    """The packing map must describe the concatenated token stream
    exactly: doc k starts where doc k-1 ended, offsets stay inside the
    budget, and the last doc's end covers the total token mass."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.quality import (
        SEQ_BUDGET,
        pack_sequences,
    )

    rows = pack_sequences(spark, sf_dir).orderBy("doc_id").collect()
    assert rows
    cum = 0
    for r in rows:
        assert r.start_seq * SEQ_BUDGET + r.start_offset == cum
        assert 0 <= r.start_offset < SEQ_BUDGET
        cum += r.n_tokens
        assert r.end_seq == (cum - 1) // SEQ_BUDGET
        assert r.start_seq <= r.end_seq
    total = load_table(spark, sf_dir, "documents").select(
        F.sum(F.size(F.split("text", " ")))
    ).first()[0]
    assert cum == total


def test_corpus_pipeline_verdicts_consistent_with_stages(spark, sf_dir):
    """The capstone composition must agree with each reused stage: every
    verdict is the FIRST failing stage in the documented precedence,
    kept docs (and only kept docs) carry a split, and token counts match
    the raw corpus."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.quality import (
        corpus_pipeline_verdicts,
        fuzzy_dedup_keep_one,
        quality_flags,
    )
    from akkastreamprocessnpmpackagedependencies_spark.operators.textops import (
        N_PROBE_DOCS,
        contamination_ngram_hits,
    )
    from akkastreamprocessnpmpackagedependencies_spark.session import load_table

    out = {r.doc_id: r for r in corpus_pipeline_verdicts(spark, sf_dir).collect()}
    d = load_table(spark, sf_dir, "documents")
    assert len(out) == d.count()
    q = {r.doc_id: r.keep for r in quality_flags(d).collect()}
    fz = {r.doc_id: r.keep for r in fuzzy_dedup_keep_one(spark, sf_dir).collect()}
    contam = {r.doc_id: r.n_gram_hits for r in contamination_ngram_hits(spark, sf_dir).collect()}
    from collections import Counter

    verdicts = Counter(r.verdict for r in out.values())
    assert verdicts["kept"] > 0 and verdicts["probe_holdout"] == N_PROBE_DOCS
    for r in out.values():
        if r.verdict == "kept":
            assert r.split in ("train", "val", "test")
            assert q[r.doc_id] and fz[r.doc_id] and not contam.get(r.doc_id)
            assert r.doc_id >= N_PROBE_DOCS
        else:
            assert r.split is None
        if r.verdict == "quality":
            assert not q[r.doc_id]
        if r.verdict == "near_dup":
            assert q[r.doc_id] and not fz[r.doc_id]
        if r.verdict == "contaminated":
            assert q[r.doc_id] and fz[r.doc_id] and contam.get(r.doc_id, 0) > 0
