"""Tests for the LLM-data-pipeline operators: dedup, similarity search,
text analysis, multimodal plumbing. sf0.001 for speed; the DuckDB oracle
harness (tools/oracle_check.py) covers exact parity at sf0.01."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from akkastreamprocessnpmpackagedependencies_spark.operators import (
    dedup,
    multimodal,
    similarity,
    textops,
)
from akkastreamprocessnpmpackagedependencies_spark.session import load_table


def test_minhash_lsh_finds_symmetric_neardups(spark, sf_dir):
    pairs = dedup.minhash_lsh_neardup(spark, sf_dir).collect()
    assert len(pairs) > 0
    for r in pairs:
        assert r.doc_a < r.doc_b  # canonical orientation, no dupes
        assert 0.0 < r.jaccard <= 1.0
        assert r.jaccard >= dedup.JACCARD_THRESHOLD


def test_minhash_lsh_catches_high_jaccard_pairs(spark, sf_dir):
    """LSH candidates must include every pair with jaccard >= 0.9 (with
    4 bands x 3 rows the miss probability at j=0.9 is ~(1-0.729)^4 < 0.6% —
    the fixed test data has no misses)."""
    docs = load_table(spark, sf_dir, "documents")
    from akkastreamprocessnpmpackagedependencies_spark.functions.text import word_shingles

    sh = docs.select("doc_id", word_shingles(F.col("text")).alias("sh"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.col("a.sh")) + F.size(F.col("b.sh")) - inter
    brute = {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter.cast("double") / union).alias("j"),
        )
        .filter(F.col("j") >= 0.9)
        .collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in dedup.minhash_lsh_neardup(spark, sf_dir).collect()}
    assert brute <= lsh


def test_neardup_clusters_cover_pairs(spark, sf_dir):
    """Connected components: both endpoints of every LSH pair land in the
    same cluster, the cluster id is the component minimum, and exactly one
    keeper exists per cluster."""
    pairs = dedup.minhash_lsh_neardup(spark, sf_dir).collect()
    clusters = {r.doc_id: r for r in dedup.neardup_clusters(spark, sf_dir).collect()}
    for p in pairs:
        assert clusters[p.doc_a].cluster_id == clusters[p.doc_b].cluster_id
    by_cluster: dict[int, list] = {}
    for r in clusters.values():
        assert r.cluster_id <= r.doc_id
        assert r.is_keeper == (r.doc_id == r.cluster_id)
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert cid == min(m.doc_id for m in members)
        assert sum(m.is_keeper for m in members) == 1


def test_cc_alternating_star_chain_converges_fast(spark):
    """Adversarial chain component (round-3 verdict #5): a 200-node path
    graph has diameter 199, so plain min-label propagation needs ~200
    rounds (the old implementation silently stopped at 20). Alternating
    large-star/small-star must collapse it to one component in O(log^2 n)
    rounds — and every node must label to the chain minimum."""
    n = 200
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    # driver_max_edges=0 forces the DISTRIBUTED path — this test exists
    # to pin the alternating-star convergence bound, which the
    # small-graph union-find fast path would otherwise intercept
    labels, rounds = dedup.cc_alternating_star(pairs, driver_max_edges=0)
    rows = labels.collect()
    assert len(rows) == n
    assert all(r.lbl == 0 for r in rows)
    assert 1 <= rounds <= 16, f"chain took {rounds} rounds"
    # the fast path (default gate) must produce the identical labels
    fast, fast_rounds = dedup.cc_alternating_star(pairs)
    assert fast_rounds == 0
    assert {(r.id, r.lbl) for r in fast.collect()} == {(r.id, r.lbl) for r in rows}


def test_cc_alternating_star_mixed_components(spark):
    """Several components of different shapes (clique, star, path, pair)
    resolve to their minima."""
    edges = (
        [(1, 2), (2, 3), (1, 3)]          # clique min 1
        + [(10, 11), (10, 12), (10, 13)]  # star min 10
        + [(20, 21), (21, 22), (22, 23)]  # path min 20
        + [(31, 30)]                      # pair min 30
    )
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    labels, _ = dedup.cc_alternating_star(pairs)
    got = {r.id: r.lbl for r in labels.collect()}
    want = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 12: 10, 13: 10,
            20: 20, 21: 20, 22: 20, 23: 20, 30: 30, 31: 30}
    assert got == want


def test_lsh_queries_release_their_caches(spark, sf_dir):
    """Round-3 verdict #7: the signature/fingerprint frames the LSH-family
    queries persist must NOT outlive the query — after the returned frame
    is materialized, the SQL cache manager holds nothing."""
    jcache = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert jcache.isEmpty()
    for fn in (
        dedup.minhash_lsh_neardup,
        dedup.chargram_jaccard_pairs,
        dedup.simhash_candidate_pairs,
        dedup.neardup_clusters,
        dedup.dedup_incremental,
        dedup.containment_prefix_pairs,  # persists its hashed-set frame
        dedup.neardup_source_matrix,  # composes the LSH pair query
        similarity.kmeans_clusters,  # kmeans_fit's cache-hygiene claim
    ):
        assert fn(spark, sf_dir).count() > 0
        assert jcache.isEmpty(), f"{fn.__name__} left a cached frame behind"


def test_lsh_raw_candidate_metric_is_observable(spark, sf_dir):
    """The dedup-late trade in _banded_pairs names verified-pairs/raw-
    candidates as the regression signal to monitor; round 17 wires it as
    a named CollectMetrics riding the query's own execution (zero extra
    jobs). The metric must be present, positive, and >= the verified
    pair count (dedup-late can only shrink the stream)."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _banded_pairs,
        _signatures,
    )
    from akkastreamprocessnpmpackagedependencies_spark.session import load_scaled

    sig = _signatures(load_scaled(spark, sf_dir, "documents")).persist()
    pairs = _banded_pairs(sig, "sh", JACCARD_THRESHOLD)
    # collect() executes THIS frame's own QueryExecution — count() would
    # plan (and attach the metric to) a different one
    n_verified = len(pairs.collect())
    m = pairs._jdf.queryExecution().observedMetrics()
    row = m.get("lsh_raw_candidates")
    assert not row.isEmpty(), "lsh_raw_candidates metric missing"
    n_raw = row.get().apply(0)
    sig.unpersist()
    assert n_raw >= n_verified > 0


def test_dedup_incremental_splits_sides(spark, sf_dir):
    """Incremental dedup pairs always go delta -> corpus: the left id is
    from the new batch (doc_id % 10 >= 8), the right from the indexed
    corpus, and every reported pair really meets the jaccard threshold
    in the self-join query's output (cross-side pairs are a subset of
    all near-dup pairs)."""
    rows = dedup.dedup_incremental(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.new_doc % 10 >= 8
        assert r.corpus_doc % 10 < 8
        assert r.jaccard >= dedup.JACCARD_THRESHOLD
    full = {
        (max(r.doc_a, r.doc_b), min(r.doc_a, r.doc_b))
        for r in dedup.minhash_lsh_neardup(spark, sf_dir).collect()
        if (r.doc_a % 10 >= 8) != (r.doc_b % 10 >= 8)
    }
    got = {(r.new_doc, r.corpus_doc) for r in rows}
    # new_doc ids aren't ordered vs corpus ids, so canonicalize both ways
    canon = {(max(a, b), min(a, b)) for a, b in got}
    assert canon == {(max(a, b), min(a, b)) for a, b in full}


def test_exact_dedup_consistency(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()
    hashed = dedup.dedup_exact_hash(spark, sf_dir)
    assert hashed.agg(F.sum("n_copies")).collect()[0][0] == n_docs
    assert hashed.count() == d.select("text").distinct().count()


def test_simhash_is_64bit(spark, sf_dir):
    """simhash_fingerprints emits the 64-bit fingerprint as two unsigned
    32-bit halves (hi = bits 32..63, lo = bits 0..31), both in [0, 2^32)."""
    rows = dedup.simhash_fingerprints(spark, sf_dir).collect()
    assert len(rows) > 0
    assert all(0 <= r.simhash_hi < (1 << 32) for r in rows)
    assert all(0 <= r.simhash_lo < (1 << 32) for r in rows)


def test_simhash_multiblock_recall_is_exhaustive(spark, sf_dir):
    """Pigeonhole guarantee: the 7-block candidate join must find EVERY
    pair at hamming <= HAMMING_MAX — compare against the brute-force
    all-pairs hamming computed directly from the fingerprints."""
    sim = dedup.simhash_fingerprints(spark, sf_dir)
    a = sim.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash_hi").alias("hi_a"),
        F.col("simhash_lo").alias("lo_a"),
    )
    b = sim.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash_hi").alias("hi_b"),
        F.col("simhash_lo").alias("lo_b"),
    )
    ham = F.bit_count(F.col("hi_a").bitwiseXOR(F.col("hi_b"))) + F.bit_count(
        F.col("lo_a").bitwiseXOR(F.col("lo_b"))
    )
    brute = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in a.join(b, F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= dedup.HAMMING_MAX)
        .collect()
    }
    blocked = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dedup.simhash_candidate_pairs(spark, sf_dir).collect()
    }
    assert len(brute) > 0
    assert blocked == brute


def test_cosine_topk_ranks_descending(spark, sf_dir):
    rows = similarity.cosine_topk_bruteforce(spark, sf_dir).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(similarity.N_QUERIES))
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rs)


def test_lsh_topk_subset_of_bucket(spark, sf_dir):
    """LSH top-k neighbors must appear in the brute-force ranking with
    cos_sim <= the brute-force best (it searches a subset)."""
    brute = {
        (r.query_id, r.neighbor_id): r.cos_sim
        for r in similarity.cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    lsh = similarity.cosine_topk_lsh(spark, sf_dir).collect()
    assert len(lsh) > 0
    brute_best = {}
    for (q, _n), c in brute.items():
        brute_best[q] = max(brute_best.get(q, -2.0), c)
    for r in lsh:
        assert r.cos_sim <= brute_best[r.query_id] + 1e-9


def test_ivf_topk_valid_ranking_and_partial_recall(spark, sf_dir):
    """IVF probes a subset of cells, so its neighbors must (a) be ranked
    correctly among themselves and (b) score no better than the brute-force
    optimum; recall@k against brute force should be non-trivial."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in similarity.cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    ivf = similarity.cosine_topk_ivf(spark, sf_dir).collect()
    assert len(ivf) > 0
    by_q: dict[int, list] = {}
    for r in ivf:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        sims = [r.cos_sim for r in rs]
        assert sims == sorted(sims, reverse=True)
        assert all(r.neighbor_id != q for r in rs)
    hits = sum((r.query_id, r.neighbor_id) in brute for r in ivf)
    assert hits / len(ivf) >= 0.2  # probing 3/8 cells should recover some true NNs


def test_quality_scores_bounds(spark, sf_dir):
    rows = textops.text_quality_scores(spark, sf_dir).collect()
    for r in rows:
        assert 0.0 <= r.stopword_ratio <= 1.0
        assert 0.0 < r.lexical_diversity <= 1.0
        assert r.quality_pass in (0, 1)


def test_lang_id_predicts_known_language(spark, sf_dir):
    rows = textops.lang_id_heuristic(spark, sf_dir).collect()
    langs = set(textops.LANG_MARKERS)
    assert all(r.pred_lang in langs for r in rows)


def test_multimodal_payload_roundtrip(spark, sf_dir):
    m = multimodal.as_media(load_table(spark, sf_dir, "documents"))
    row = m.filter(F.col("doc_id") == 0).collect()[0]
    assert isinstance(row.payload, (bytes, bytearray))
    assert row.meta.n_bytes == len(row.payload)
    assert row.meta.mime.startswith("application/x-")


def test_multimodal_decode_features_match_python(spark, sf_dir):
    feats = {r.doc_id: r for r in multimodal.multimodal_decode_features(spark, sf_dir).collect()}
    docs = {r.doc_id: r.text for r in load_table(spark, sf_dir, "documents").limit(50).collect()}
    for doc_id, text in docs.items():
        b = text.encode()
        r = feats[doc_id]
        assert r.n_bytes == len(b)
        assert r.mean_byte == pytest.approx(sum(b) / len(b))
        assert r.head_hex == b[:8].hex().upper()


def test_decode_image_real_raises_without_codec(spark, sf_dir):
    m = multimodal.as_media(load_table(spark, sf_dir, "documents")).limit(1)
    out = multimodal.decode_image_real(m.select("doc_id", "payload"))
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )

def test_kmeans_lloyd_invariants(spark, sf_dir):
    """Lloyd's algorithm: assignments partition the corpus into k clusters
    and inertia is non-increasing across iterations."""
    from akkastreamprocessnpmpackagedependencies_spark.session import load_scaled

    asg, inertia = similarity.kmeans_fit(spark, sf_dir)
    n_vec = load_scaled(spark, sf_dir, "embeddings").count()
    rows = asg.collect()
    assert len(rows) == n_vec
    assert len({r.vec_id for r in rows}) == n_vec
    assert {r.centroid_id for r in rows} <= set(range(similarity.K_CLUSTERS))
    for a, b in zip(inertia, inertia[1:]):
        assert b <= a + 1e-6
    summary = similarity.kmeans_clusters(spark, sf_dir).collect()
    assert sum(r.n_members for r in summary) == n_vec


def test_kmeans_centroids_drive_neardup_blocking(spark, sf_dir):
    """The production blocking path: embedding_neardup_pairs accepts the
    fitted centroid frame from kmeans_fit (the default anchor centroids
    exist only for oracle determinism). Fitted cells are at least as tight
    as the arbitrary anchors, so every pair the anchor blocking finds at
    cos > 0.4 should still be discoverable; we assert the path runs, emits
    the same schema, and returns canonical (vec_a < vec_b) pairs above the
    threshold."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import (
        _update,
    )

    asg, _ = similarity.kmeans_fit(spark, sf_dir)
    fitted = _update(asg)  # (centroid_id, cv) — same schema as the anchors
    rows = similarity.embedding_neardup_pairs(spark, sf_dir, centroids=fitted).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.vec_a < r.vec_b
        assert r.cos_sim > 0.4
    assert len({(r.vec_a, r.vec_b) for r in rows}) == len(rows)  # deduped


def test_pii_scan_detects_all_seeded_docs(spark, sf_dir):
    """Every 13th document carries synthetic PII; the scan must count
    exactly those documents per language."""
    d = load_table(spark, sf_dir, "documents")
    want = {
        r.lang: r.n
        for r in d.filter(F.col("doc_id") % 13 == 0).groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    got = {r.lang: r.n_docs_with_email for r in textops.pii_scan(spark, sf_dir).collect()}
    for lang, n in want.items():
        assert got[lang] == n
    assert all(v == 0 for lang, v in got.items() if lang not in want)


def test_bm25_topk_scores_ordered_and_bounded(spark, sf_dir):
    """BM25 invariants: exactly top-k rows, scores strictly ordered under
    the (score desc, doc_id) tie-break, every score positive (every
    returned doc matched at least one query term), and the best doc's
    score never exceeds the sum of all-term idf*(k1+1) (the tf->inf
    asymptote of the saturation curve)."""
    import math

    rows = textops.bm25_topk_docs(spark, sf_dir).collect()
    assert 0 < len(rows) <= textops.BM25_TOP_K
    for a, b in zip(rows, rows[1:]):
        assert (a.bm25, -a.doc_id) >= (b.bm25, -b.doc_id)
        assert a.bm25 > 0
    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    # loosest possible idf (df=1) summed over all query terms
    ceiling = len(textops.BM25_TERMS) * math.log(1 + (n_docs - 1 + 0.5) / 1.5) * (
        textops.BM25_K1 + 1.0
    )
    assert rows[0].bm25 < ceiling


def test_duplicate_ngram_overlap_matches_brute_force(spark, sf_dir):
    """dup_share must equal the brute-force cross-doc computation on a
    small slice: a gram is shared iff some OTHER doc has it."""
    from akkastreamprocessnpmpackagedependencies_spark.functions.text import (
        base_hashes,
        word_shingles,
    )

    out = {
        r.doc_id: r
        for r in textops.duplicate_ngram_overlap(spark, sf_dir).collect()
    }
    sh = (
        load_table(spark, sf_dir, "documents")
        .select(
            "doc_id",
            F.array_distinct(
                base_hashes(word_shingles(F.col("text"), textops.DUP_K))
            ).alias("g"),
        )
        .collect()
    )
    grams = {r.doc_id: set(r.g) for r in sh}
    for doc_id, g in list(grams.items())[:25]:
        others = set().union(*(v for k, v in grams.items() if k != doc_id))
        n_shared = len(g & others)
        assert out[doc_id].n_grams == len(g)
        assert out[doc_id].n_shared == n_shared
        assert abs(out[doc_id].dup_share - n_shared / len(g)) < 1e-12


def test_duplicate_ngram_overlap_gated_shapes_identical(spark, sf_dir):
    """The round-17 input-size gate picks between the gram-key WINDOW
    (micro scale) and the skew-immune partial-agg + join-back (above
    DUP_WINDOW_MAX_BYTES). Both shapes must return the identical row
    multiset, and the gate must actually switch the plan: the big-corpus
    shape may contain NO window over the gram key (a hot boilerplate
    gram would pin its whole row set to one unsplittable task)."""
    win = textops.duplicate_ngram_overlap(spark, sf_dir)
    old = textops.DUP_WINDOW_MAX_BYTES
    textops.DUP_WINDOW_MAX_BYTES = 0  # force the above-gate shape
    try:
        agg = textops.duplicate_ngram_overlap(spark, sf_dir)
        assert agg.exceptAll(win).isEmpty() and win.exceptAll(agg).isEmpty()
        agg_plan = agg._sc._jvm.PythonSQLUtils.explainString(
            agg._jdf.queryExecution(), "simple"
        )
        assert "Window" not in agg_plan
        assert "partial_count" in agg_plan  # map-side combine on the gram key
    finally:
        textops.DUP_WINDOW_MAX_BYTES = old


def test_dataset_split_assign_deterministic_and_partitioned(spark, sf_dir):
    """Split assignment is a pure function of doc_id (identical across two
    runs), covers every doc exactly once, and lands near the designed
    81.25/12.5/6.25 proportions."""
    a = {r.doc_id: r.split for r in textops.dataset_split_assign(spark, sf_dir).collect()}
    b = {r.doc_id: r.split for r in textops.dataset_split_assign(spark, sf_dir).collect()}
    assert a == b
    n = load_table(spark, sf_dir, "documents").count()
    assert len(a) == n
    from collections import Counter

    c = Counter(a.values())
    assert set(c) <= {"train", "val", "test"}
    assert c["train"] / n == pytest.approx(13 / 16, abs=0.08)
    assert c["val"] / n == pytest.approx(2 / 16, abs=0.06)


def test_events_funnel_monotone_and_consistent(spark, sf_dir):
    """Funnel stage counts must be monotonically non-increasing, and stage 1
    must equal the number of distinct users with a view event."""
    from akkastreamprocessnpmpackagedependencies_spark.operators import timeseries

    rows = {r.stage: r for r in timeseries.events_funnel_conversion(spark, sf_dir).collect()}
    assert list(sorted(rows)) == [1, 2, 3]
    assert rows[1].n_users >= rows[2].n_users >= rows[3].n_users >= 0
    viewers = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "view")
        .select("user_id").distinct().count()
    )
    assert rows[1].n_users == viewers


def test_events_retention_cohort_zero_offset_covers_all_users(spark, sf_dir):
    """Every user is active in their own cohort week, so the week_offset=0
    rows must sum to the total distinct-user count, and no offset is
    negative."""
    from akkastreamprocessnpmpackagedependencies_spark.operators import timeseries

    rows = timeseries.events_retention_cohorts(spark, sf_dir).collect()
    assert rows
    assert all(r.week_offset >= 0 for r in rows)
    zero = sum(r.n_users for r in rows if r.week_offset == 0)
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert zero == total_users


def test_embedding_covariance_symmetric_psd_diag(spark, sf_dir):
    """Covariance invariants: the upper triangle reassembled into a full
    matrix is symmetric by construction, its diagonal is non-negative,
    and it matches numpy's covariance of the same vectors to the decimal
    quantization tolerance."""
    import numpy as np

    rows = similarity.embedding_covariance(spark, sf_dir).collect()
    d = similarity.DIM
    assert len(rows) == d * (d + 1) // 2
    cov = np.zeros((d, d))
    for r in rows:
        cov[r.i, r.j] = cov[r.j, r.i] = r.cov
    assert (np.diag(cov) >= 0).all()
    vecs = np.vstack([
        np.asarray(r.v)
        for r in similarity._corpus(spark, sf_dir).select("v").collect()
    ])
    want = np.cov(vecs, rowvar=False)
    # decimal(18,6) quantization of each summand bounds the error
    assert np.abs(cov - want).max() < 1e-5


def test_embedding_pca_project_spectral_invariants(spark, sf_dir):
    """PCA invariants an incorrect implementation cannot fake: the
    per-component sample variances equal the top eigenvalues of the
    corpus covariance in descending order, components are mutually
    decorrelated, and repeated runs are bit-identical (deterministic
    sign fix)."""
    import numpy as np

    out = similarity.embedding_pca_project(spark, sf_dir)
    rows = out.collect()
    k = similarity.PCA_K
    ids = sorted({r.vec_id for r in rows})
    p = np.zeros((len(ids), k))
    idx = {v: i for i, v in enumerate(ids)}
    for r in rows:
        p[idx[r.vec_id], r.comp] = r.coord
    vecs = np.vstack([
        np.asarray(r.v)
        for r in similarity._corpus(spark, sf_dir).select("v").collect()
    ])
    evals = np.sort(np.linalg.eigvalsh(np.cov(vecs, rowvar=False)))[::-1][:k]
    got_var = p.var(axis=0, ddof=1)
    assert np.allclose(got_var, evals, rtol=1e-3)
    assert (np.diff(got_var) <= 1e-9).all()  # descending variance
    centered = p - p.mean(axis=0)
    cross = centered.T @ centered / (len(ids) - 1)
    off = cross - np.diag(np.diag(cross))
    assert np.abs(off).max() < 1e-3
    rerun = {(r.vec_id, r.comp): r.coord for r in similarity.embedding_pca_project(spark, sf_dir).collect()}
    assert all(rerun[(r.vec_id, r.comp)] == r.coord for r in rows)


def test_pca_fixed_basis_is_orthonormal_and_projection_matches_numpy(spark, sf_dir):
    """The committed basis really is a recorded orthonormal model (B^T B =
    I to the 6 dp literal rounding), and the distributed projection equals
    the numpy ground truth on a sample — the green-twin guarantee behind
    pca_project_fixed_basis' oracle row."""
    import numpy as np

    B = np.array(similarity.PCA_BASIS).T  # d x k
    gram = B.T @ B
    assert np.abs(gram - np.eye(similarity.PCA_BASIS_K)).max() < 1e-4

    out = similarity.pca_project_fixed_basis(spark, sf_dir)
    got = {(r.vec_id, r.comp): r.coord for r in out.collect()}
    e = similarity._corpus(spark, sf_dir).select("vec_id", "v").limit(20).collect()
    for row in e:
        want = np.array(row.v) @ B
        for c in range(similarity.PCA_BASIS_K):
            assert abs(got[(row.vec_id, c)] - round(float(want[c]), 6)) < 1e-6


def test_pii_redact_sha_matches_python_and_no_pattern_survives(spark, sf_dir):
    """Independent ground truth for the redaction: re-run the seeding and
    the replacement chain in Python's re on the raw corpus — the reported
    digests must match byte-for-byte, the counts must match re.findall,
    and NO pattern may still match the redacted text (the invariant that
    makes the operator a redactor rather than a rewriter)."""
    import hashlib
    import re

    out = {r.doc_id: r for r in textops.pii_redact(spark, sf_dir).collect()}
    assert out, "seeded corpus must produce at least one redacted doc"
    raw = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    pats = [textops.PII_EMAIL, textops.PII_URL, textops.PII_SSN]
    touched = 0
    for doc_id, text in raw.items():
        if doc_id % textops.PII_SEED_EVERY == 0:
            text = (
                f"{text} contact user{doc_id}"
                f"@example.com or https://example.com/d/{doc_id}"
            )
        counts = [len(re.findall(p, text)) for p in pats]
        red = text
        for p in pats:
            red = re.sub(p, textops.PII_MASK, red)
        if sum(counts) == 0:
            assert doc_id not in out  # untouched docs filtered out
            continue
        touched += 1
        row = out[doc_id]
        assert [row.n_emails, row.n_urls, row.n_ssn_like] == counts
        assert row.redacted_sha == hashlib.sha256(red.encode()).hexdigest()
        assert row.n_chars_after == len(red)
        # the mask token must not itself re-match (no infinite-loop shape),
        # and no pattern survives the chain
        for p in pats:
            assert not re.search(p, red), (doc_id, p)
    assert touched == len(out)


def test_chunk_documents_tile_every_token_exactly(spark, sf_dir):
    """Chunk geometry invariants per document: starts advance by exactly
    CHUNK_STRIDE from 0 (contiguous chunk_idx), every chunk holds
    1..CHUNK_TOKENS tokens, the last chunk ends exactly at the document's
    last token, and a recomputed sha for the first chunk of a sample doc
    pins the content."""
    import hashlib

    rows = textops.chunk_documents(spark, sf_dir).collect()
    toks = {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(toks)
    for doc_id, chunks in by_doc.items():
        n = len(toks[doc_id])
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            start = c.chunk_idx * textops.CHUNK_STRIDE
            assert 1 <= c.n_chunk_tokens <= textops.CHUNK_TOKENS
            assert c.n_chunk_tokens == min(textops.CHUNK_TOKENS, n - start)
        last = chunks[-1]
        assert last.chunk_idx * textops.CHUNK_STRIDE + last.n_chunk_tokens == n
        want = " ".join(toks[doc_id][: textops.CHUNK_TOKENS])
        assert chunks[0].chunk_sha == hashlib.sha256(want.encode()).hexdigest()


def test_bigram_salted_topk_equals_naive_window(spark, sf_dir):
    """The exact-two-phase claim: pruning to per-(lang, salt) top-K before
    the global per-lang rank must be LOSSLESS — the result equals the
    naive single-window form the oracle runs (any global top-K member is
    top-K within its salt bucket)."""
    from pyspark.sql.window import Window as W

    got = {
        (r.lang, r.gram): (r.cnt, r.w1_total, r.cond_prob)
        for r in textops.bigram_lm_probs(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    t = d.select("lang", F.split("text", " ").alias("t")).filter(F.size("t") >= 2)
    grams = t.select(
        "lang",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i, F.lit(2))),
            )
        ).alias("gram"),
    )
    c = grams.groupBy("lang", "gram").agg(F.count("*").cast("long").alias("cnt"))
    w1 = F.substring_index(F.col("gram"), " ", 1)
    naive = (
        c.withColumn("w1_total", F.sum("cnt").over(W.partitionBy("lang", w1)).cast("long"))
        .withColumn(
            "rnk",
            F.row_number().over(
                W.partitionBy("lang").orderBy(F.col("cnt").desc(), "gram")
            ),
        )
        .filter(F.col("rnk") <= textops.BIGRAM_TOP_K)
    )
    want = {
        (r.lang, r.gram): (r.cnt, r.w1_total, float(r.cnt) / r.w1_total)
        for r in naive.collect()
    }
    assert got == want


def test_corpus_budget_select_is_maximal_quality_prefix(spark, sf_dir):
    """The selection must be exactly the maximal prefix of the
    (score DESC, doc_id) quality order whose preceding token mass stays
    under the budget — recomputed locally from the raw corpus, including
    the bucketed prefix sums."""
    from akkastreamprocessnpmpackagedependencies_spark.operators import quality

    got = {r.doc_id: r for r in quality.corpus_budget_select(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    scored = []
    for r in docs:
        toks = r.text.split(" ")
        scored.append((len(set(toks)) / len(toks), r.doc_id, len(toks)))
    scored.sort(key=lambda t: (-t[0], t[1]))
    cum, want = 0, {}
    for score, doc_id, n in scored:
        if cum < quality.BUDGET_TOKENS:
            want[doc_id] = (n, score, cum + n)
        cum += n
    assert set(got) == set(want)
    for doc_id, (n, score, cum_tokens) in want.items():
        row = got[doc_id]
        assert (row.n_tokens, row.cum_tokens) == (n, cum_tokens)
        assert abs(row.score - score) < 1e-12


def test_ann_recall_eval_matches_python_recomputation(spark, sf_dir):
    """ann_recall_eval's numbers recomputed in pure Python from the three
    collected ANN frames: per-variant total hits, exact-division
    recall@k, and the per-query minimum must agree; a variant can never
    beat perfect recall, and brute force against itself would be 1.0 by
    construction (sanity anchor on the exact side)."""
    from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
        ann_recall_eval,
        cosine_topk_bruteforce,
        cosine_topk_ivf,
        cosine_topk_lsh,
    )

    got = {r.variant: r for r in ann_recall_eval(spark, sf_dir).collect()}
    assert set(got) == {"lsh", "ivf"}
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk_bruteforce(spark, sf_dir).collect()
    }
    assert len(exact) == N_QUERIES * TOP_K
    for name, fn in (("lsh", cosine_topk_lsh), ("ivf", cosine_topk_ivf)):
        approx = {(r.query_id, r.neighbor_id) for r in fn(spark, sf_dir).collect()}
        hits_by_q: dict[int, int] = {q: 0 for q, _ in exact}
        for q, n in exact & approx:
            hits_by_q[q] += 1
        total = sum(hits_by_q.values())
        row = got[name]
        assert row.n_queries == N_QUERIES
        assert row.total_hits == total
        assert row.recall_at_k == total / (N_QUERIES * TOP_K)
        assert row.min_query_recall == min(hits_by_q.values()) / TOP_K
        assert 0.0 <= row.min_query_recall <= row.recall_at_k <= 1.0


def test_split_leakage_audit_matches_python_recomputation(spark, sf_dir):
    """The audit's split profiles recomputed in pure Python: normalize
    each document with the same canonical chain, group by the md5 of the
    normalized text, assign splits with the same md5-prefix rule, and
    compare every (profile -> groups/docs/largest) row. Any profile with
    a '+' is a leak; single-split profiles are duplicate-but-contained."""
    import hashlib
    import re

    from akkastreamprocessnpmpackagedependencies_spark.operators.quality import (
        split_leakage_audit,
    )
    from akkastreamprocessnpmpackagedependencies_spark.operators.textops import (
        SPLIT_TRAIN_MAX,
        SPLIT_VAL_MAX,
    )

    # the synthetic corpus only contains normalized-text duplicate groups
    # at sf0.1 (8 groups; sf0.001/sf0.01 are dup-free) — exercise the
    # audit where the leaks can exist
    sf_dir = "/root/testdata/sf0.1"
    if not os.path.isdir(sf_dir):
        pytest.skip("sf0.1 testdata (the only scale with dup groups) absent")
    got = {
        r.split_profile: (r.n_dup_groups, r.n_docs, r.largest_group)
        for r in split_leakage_audit(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    groups: dict[str, list[str]] = {}
    for r in docs:
        norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", "", r.text.lower())).strip()
        key = hashlib.md5(norm.encode()).hexdigest()
        h = hashlib.md5(str(r.doc_id).encode()).hexdigest()[0]
        split = (
            "train" if h <= SPLIT_TRAIN_MAX else "val" if h <= SPLIT_VAL_MAX else "test"
        )
        groups.setdefault(key, []).append(split)
    want: dict[str, list[int]] = {}
    for members in groups.values():
        if len(members) < 2:
            continue
        profile = "+".join(sorted(set(members)))
        acc = want.setdefault(profile, [0, 0, 0])
        acc[0] += 1
        acc[1] += len(members)
        acc[2] = max(acc[2], len(members))
    assert got == {k: tuple(v) for k, v in want.items()}
    assert got, "synthetic corpus must contain duplicate groups"


def test_pq_codes_shape_and_reconstruction_invariants(spark, sf_dir):
    """Product quantization must (a) assign every corpus vector exactly
    PQ_M codes in [0, PQ_K), (b) report a reconstruction error equal to
    the recomputed distance between the vector and its codebook
    reconstruction, and (c) beat the iteration-0 codebooks — the Lloyd
    non-increase, per subspace, surfaced at the corpus level."""
    import numpy as np

    from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        _corpus,
        embedding_pq_codes,
        pq_fit,
    )

    rows = embedding_pq_codes(spark, sf_dir).collect()
    vecs = {r.vec_id: np.array(r.v) for r in _corpus(spark, sf_dir).collect()}
    assert len(rows) == len(vecs)
    asg1, _ = pq_fit(spark, sf_dir, iters=1)
    total_d2_it1 = sum(r.d2 for r in asg1.collect())
    _, cent = pq_fit(spark, sf_dir)
    books = {(r.sub_id, r.code): np.array(r.cv) for r in cent.collect()}
    total_d2 = 0.0
    for r in rows[:60]:
        codes = [int(c) for c in r.codes.split("-")]
        assert len(codes) == PQ_M and all(0 <= c < PQ_K for c in codes)
        recon = np.concatenate([books[(s, c)] for s, c in enumerate(codes)])
        want = float(((vecs[r.vec_id] - recon) ** 2).sum())
        assert r.recon_d2 == pytest.approx(want, rel=1e-9)
    total_final = sum(r.recon_d2 for r in rows)
    assert total_final <= total_d2_it1 + 1e-9  # Lloyd never degrades


def test_pq_adc_topk_approximates_exact_l2(spark, sf_dir):
    """ADC scoring is an approximation with a known floor: ranks must be
    a clean 1..TOP_K per query, every ADC distance must equal the sum of
    the query's exact subvector distances to the NEIGHBOR'S codebook
    entries (recomputed in numpy), and recall against exact L2 top-K
    must clear a sanity floor on the structured synthetic corpus."""
    import numpy as np

    from akkastreamprocessnpmpackagedependencies_spark.operators.similarity import (
        N_QUERIES,
        PQ_SUBDIM,
        TOP_K,
        _corpus,
        embedding_pq_codes,
        pq_adc_topk,
        pq_fit,
    )

    got = pq_adc_topk(spark, sf_dir).collect()
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r)
    assert set(per_q) == set(range(N_QUERIES))
    vecs = {r.vec_id: np.array(r.v) for r in _corpus(spark, sf_dir).collect()}
    _, cent = pq_fit(spark, sf_dir)
    books = {(r.sub_id, r.code): np.array(r.cv) for r in cent.collect()}
    codes = {
        r.vec_id: [int(c) for c in r.codes.split("-")]
        for r in embedding_pq_codes(spark, sf_dir).collect()
    }
    hits = 0
    for q, rows in per_q.items():
        assert sorted(r.rank for r in rows) == list(range(1, TOP_K + 1))
        qv = vecs[q]
        for r in rows[:5]:
            want = sum(
                float(
                    (
                        (
                            qv[s * PQ_SUBDIM : (s + 1) * PQ_SUBDIM]
                            - books[(s, c)]
                        )
                        ** 2
                    ).sum()
                )
                for s, c in enumerate(codes[r.neighbor_id])
            )
            assert r.adc_d2 == pytest.approx(want, rel=1e-9)
        exact = sorted(
            ((float(((vecs[v] - qv) ** 2).sum()), v) for v in vecs if v != q)
        )[:TOP_K]
        exact_ids = {v for _, v in exact}
        hits += len(exact_ids & {r.neighbor_id for r in rows})
    assert hits / (N_QUERIES * TOP_K) >= 0.2  # compressed-domain sanity floor


def test_doc_perplexity_bigram_mle_properties(spark, sf_dir):
    """Self-scored unsmoothed MLE invariants: every >=2-token document is
    scored, cross-entropy is non-negative (probabilities never exceed 1),
    exact-duplicate documents get identical scores (model and fold are
    deterministic functions of the corpus), and a spot-checked document's
    score matches a pure-Python recomputation of the per-language model."""
    import math

    from akkastreamprocessnpmpackagedependencies_spark.operators.textops import (
        doc_perplexity_bigram,
    )

    got = {r.doc_id: r for r in doc_perplexity_bigram(spark, sf_dir).collect()}
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text").collect()
    eligible = {r.doc_id: r for r in docs if len(r.text.split(" ")) >= 2}
    assert set(got) == set(eligible)
    assert all(r.cross_entropy >= 0.0 for r in got.values())
    by_text = {}
    for r in docs:
        if r.doc_id in got:
            by_text.setdefault((r.lang, r.text), []).append(got[r.doc_id].cross_entropy)
    for scores in by_text.values():
        assert len(set(scores)) == 1  # duplicates score identically
    # pure-Python recomputation for a handful of docs
    counts: dict[tuple, int] = {}
    w1tot: dict[tuple, int] = {}
    grams_of = {}
    for r in eligible.values():
        t = r.text.split(" ")
        gs = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        grams_of[r.doc_id] = (r.lang, gs)
        for g in gs:
            counts[(r.lang, g)] = counts.get((r.lang, g), 0) + 1
    for (lang, g), n in counts.items():
        w1tot[(lang, g[0])] = w1tot.get((lang, g[0]), 0) + n
    for doc_id in list(eligible)[:25]:
        lang, gs = grams_of[doc_id]
        ce = -sum(
            math.log(counts[(lang, g)] / w1tot[(lang, g[0])]) for g in gs
        ) / len(gs)
        assert got[doc_id].cross_entropy == pytest.approx(ce, abs=5e-7)
        assert got[doc_id].n_bigrams == len(gs)


def test_containment_prefix_pairs_exact_recall_vs_bruteforce(spark, sf_dir):
    """The prefix filter's recall guarantee is a THEOREM (a pair at
    containment >= T can miss at most (1-T)*n < floor(n/5)+1 of src's
    shingles, so at least one of src's floor(n/5)+1 rarest shingles must
    hit dst) — this pins the IMPLEMENTATION to it: against a brute-force
    all-pairs containment join over the same hashed shingle sets, the
    prefix-filtered query returns exactly the same (src, dst,
    containment) rows. Also pins directionality: each qualifying
    direction is its own row with its own denominator (|S(src)|), so
    mutual pairs of unequal-size docs carry two DIFFERENT containment
    values."""
    from akkastreamprocessnpmpackagedependencies_spark.functions.text import (
        base_hashes,
        word_shingles,
    )

    got = {
        (r.src_doc, r.dst_doc): r.containment
        for r in dedup.containment_prefix_pairs(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents")
    sets_ = d.select(
        "doc_id",
        F.array_distinct(base_hashes(word_shingles(F.col("text")))).alias("hs"),
    )
    ix = F.size(F.array_intersect(F.col("a.hs"), F.col("b.hs")))
    brute = {
        (r.src_doc, r.dst_doc): r.containment
        for r in (
            sets_.alias("a")
            .crossJoin(sets_.alias("b"))  # test-only oracle; 500 docs
            .filter(F.col("a.doc_id") != F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("src_doc"),
                F.col("b.doc_id").alias("dst_doc"),
                (ix.cast("double") / F.size(F.col("a.hs"))).alias(
                    "containment"
                ),
            )
            .filter(F.col("containment") >= dedup.CONTAINMENT_T)
            .collect()
        )
    }
    assert got == brute
    assert got, "sf corpus is known to contain contained docs"
    # directionality: mutual pairs of unequal-size sets must report two
    # different ratios (same intersection, different denominators); in
    # this synthetic corpus every qualifying pair happens to be mutual
    # at T=0.8, which is itself worth pinning — a regression to
    # symmetric jaccard would also pass a mutual-only check, but not
    # the per-direction value check below
    diff = [
        p for p in got
        if (p[1], p[0]) in got and got[p] != got[(p[1], p[0])]
    ]
    assert diff, "expected a mutual pair with direction-dependent values"


def test_neardup_source_matrix_consistent_with_pairs(spark, sf_dir):
    """The source matrix is exactly the LSH pair set rolled up: total
    n_pairs equals the pair count, every key is an unordered source
    pair (source_a <= source_b), and each cell recounts its own pairs."""
    pairs = dedup.minhash_lsh_neardup(spark, sf_dir).collect()
    srcs = {
        r.doc_id: r.source
        for r in load_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    expected: dict[tuple[str, str], int] = {}
    for p in pairs:
        key = tuple(sorted((srcs[p.doc_a], srcs[p.doc_b])))
        expected[key] = expected.get(key, 0) + 1
    got = {
        (r.source_a, r.source_b): r.n_pairs
        for r in dedup.neardup_source_matrix(spark, sf_dir).collect()
    }
    assert got == expected
    assert all(a <= b for a, b in got)
    assert sum(got.values()) == len(pairs)
