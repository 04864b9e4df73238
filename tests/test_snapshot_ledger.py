"""Incremental snapshot ledger over the exact-dedup streaming corpus:
the ledger's cumulative per-bucket state must equal a full rebuild from
the corpus at every point (the incremental-vs-rebuild validation the
batch snapshot_diff docstring describes), diffs must be grouping-aware
(changed buckets only), and the crash window (corpus append landed,
ledger append lost) must heal at the next stream start."""

from __future__ import annotations

import glob
import os
import time

from pyspark.sql import functions as F

import akkastreamprocessnpmpackagedependencies_spark.streaming.pipeline as sp
from akkastreamprocessnpmpackagedependencies_spark.session import load_table


def _state_rows(df):
    return {
        r.dig_bucket: (r.n_docs, r.fp, r.bytes_sum)
        for r in df.select("dig_bucket", "n_docs", "fp", "bytes_sum").collect()
    }


def _run(spark, schema, src, corpus, ledger, ck, max_files=1):
    q = (
        sp.write_exact_dedup_gated(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files)
            .parquet(src),
            corpus,
            ledger_path=ledger,
        )
        .option("checkpointLocation", ck)
        .start()
    )
    q.processAllAvailable()
    q.stop()


def test_ledger_matches_rebuild_and_diff_is_grouping_aware(
    spark, sf_dir, tmp_path
):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    d.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    (
        d.filter(F.col("doc_id") % 4 == 2)
        .coalesce(1).write.mode("append").parquet(src)
    )
    corpus, ledger = str(tmp_path / "corpus"), str(tmp_path / "ledger")
    _run(spark, d.schema, src, corpus, ledger, str(tmp_path / "ck1"))

    # incremental state == full rebuild from the corpus, bit for bit
    state = _state_rows(sp.snapshot_ledger_state(spark, ledger))
    truth = _state_rows(sp.ledger_recompute(spark, corpus))
    assert state == truth and state

    # two batches ran -> versions 0 and 1; state AT version 0 must equal
    # a rebuild of what batch 0 alone admitted (batch ids are file order)
    versions = sorted(
        r.version
        for r in spark.read.parquet(ledger).select("version").distinct().collect()
    )
    assert versions == [0, 1]

    # the diff 0 -> latest lists exactly the buckets batch 1 touched,
    # and its n_added sums to batch 1's admitted row count
    at0 = _state_rows(sp.snapshot_ledger_state(spark, ledger, 0))
    diff = {
        r.dig_bucket: r
        for r in sp.snapshot_ledger_diff(spark, ledger, 0).collect()
    }
    changed_truth = {
        b for b in truth if b not in at0 or truth[b] != at0[b]
    }
    assert set(diff) == changed_truth and diff
    n_batch1 = sum(truth[b][0] - at0.get(b, (0,))[0] for b in changed_truth)
    assert sum(r.n_added for r in diff.values()) == n_batch1
    for b, r in diff.items():
        if b in at0:
            assert r.change_type == "grown" and r.fp_old == at0[b][1]
        else:
            assert r.change_type == "new_bucket" and r.fp_old is None
        assert r.fp_new == truth[b][1]
        assert r.n_added >= 1 and r.bytes_added >= 0

    # same-version diff is empty (nothing changed)
    assert sp.snapshot_ledger_diff(spark, ledger, 1, 1).count() == 0

    # full replay under a fresh checkpoint admits nothing -> the ledger
    # gains no rows (zero-admission batches write nothing)
    n_rows = spark.read.parquet(ledger).count()
    _run(spark, d.schema, src, corpus, ledger, str(tmp_path / "ck2"))
    assert spark.read.parquet(ledger).count() == n_rows


def test_ledger_heals_lost_append_at_next_start(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src = str(tmp_path / "src")
    d.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.parquet(src)
    time.sleep(1.1)
    (
        d.filter(F.col("doc_id") % 4 == 2)
        .coalesce(1).write.mode("append").parquet(src)
    )
    corpus, ledger = str(tmp_path / "corpus"), str(tmp_path / "ledger")
    _run(spark, d.schema, src, corpus, ledger, str(tmp_path / "ck1"))

    # simulate the crash window: batch 1's corpus append survived but its
    # ledger append was lost — drop the ledger file holding version 1
    # (appends write one file per batch below the compaction threshold)
    lost = [
        p for p in glob.glob(os.path.join(ledger, "*.parquet"))
        if any(
            r.version == 1
            for r in spark.read.parquet(f"file://{p}").select("version").collect()
        )
    ]
    assert lost
    for p in lost:
        os.remove(p)
    stale = _state_rows(sp.snapshot_ledger_state(spark, ledger))
    truth = _state_rows(sp.ledger_recompute(spark, corpus))
    assert stale != truth  # genuinely diverged

    # next start (fresh checkpoint replays everything; every row is a
    # duplicate, so admissions are zero): reconcile must heal the
    # divergent buckets before the first batch, partition-pruned
    _run(spark, d.schema, src, corpus, ledger, str(tmp_path / "ck2"))
    healed = _state_rows(sp.snapshot_ledger_state(spark, ledger))
    assert healed == truth


def test_ledger_bootstraps_over_preexisting_corpus(spark, sf_dir, tmp_path):
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    src1, src2 = str(tmp_path / "src1"), str(tmp_path / "src2")
    d.filter(F.col("doc_id") % 4 == 1).coalesce(1).write.parquet(src1)
    d.filter(F.col("doc_id") % 4 == 2).coalesce(1).write.parquet(src2)
    corpus, ledger = str(tmp_path / "corpus"), str(tmp_path / "ledger")

    # phase 1: corpus predates the ledger entirely
    q = (
        sp.write_exact_dedup_gated(
            spark.readStream.schema(d.schema).parquet(src1), corpus
        )
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert not os.path.exists(ledger)

    # phase 2: adopting the ledger backfills version 0 from the corpus,
    # then folds the new batch incrementally on top
    _run(spark, d.schema, src2, corpus, ledger, str(tmp_path / "ck2"))
    truth = _state_rows(sp.ledger_recompute(spark, corpus))
    assert _state_rows(sp.snapshot_ledger_state(spark, ledger)) == truth
    # version 0 is the backfill: it must equal a rebuild of phase 1 alone
    at0 = _state_rows(sp.snapshot_ledger_state(spark, ledger, 0))
    phase1 = {
        b: v for b, v in truth.items()
    }
    # recompute phase-1 truth directly from the phase-1 admissions
    base = spark.read.parquet(corpus)
    # phase-1 rows are exactly those whose doc_id came from src1
    ids1 = {r.doc_id for r in spark.read.parquet(src1).select("doc_id").collect()}
    p1 = base.filter(F.col("doc_id").isin(list(ids1)))
    phase1 = {
        r.dig_bucket: (r.n_docs, r.fp, r.bytes_sum)
        for r in sp._ledger_partial(p1).collect()
    }
    assert at0 == phase1
