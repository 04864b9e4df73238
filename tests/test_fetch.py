"""Record/replay harness for the HTTP enrichment path: the
retry/backoff/token-bucket engine (fetch.ThrottledFetcher) executes against
canned transcripts covering all four outcome families — 200, 404,
5xx-then-success, connection-error — with no network. Timing behavior is
unit-tested with a fake clock; the Spark mapInPandas live path and the
npmregistry source's replay mode run end-to-end."""

from __future__ import annotations

import json
import os

from akkastreamprocessnpmpackagedependencies_spark import fetch
from akkastreamprocessnpmpackagedependencies_spark.schemas import PACKAGES_SCHEMA
from akkastreamprocessnpmpackagedependencies_spark.sources.registry import register


class FakeClock:
    def __init__(self) -> None:
        self.t = 0.0
        self.sleeps: list[float] = []

    def clock(self) -> float:
        return self.t

    def sleep(self, d: float) -> None:
        self.sleeps.append(round(d, 9))
        self.t += d


def _fetcher(transport, **kw):
    fc = FakeClock()
    f = fetch.ThrottledFetcher(transport, sleep=fc.sleep, clock=fc.clock, **kw)
    return f, fc


def test_backoff_and_token_bucket_timing():
    """5xx and connection errors back off 2^attempt seconds; successive
    requests are spaced by the token-bucket interval (1/rate)."""
    t = fetch.ReplayTransport({"pkg": ["error", 503, [200, "BODY"]]})
    f, fc = _fetcher(t, rate_per_sec=0.5, max_retries=3)
    assert f("pkg") == (200, "BODY")
    # attempt 0 admits free, errors, backs off 1s; attempt 1 waits 1s more
    # to honor the 2s token interval, gets 503, backs off 2s; attempt 2
    # admits free (interval already elapsed) and succeeds
    assert fc.sleeps == [1.0, 1.0, 2.0]
    # next request immediately after: pure token-bucket wait of 2s
    assert f("pkg") == (200, "BODY")
    assert fc.sleeps[3:] == [2.0]


def test_404_returns_immediately_without_retry():
    calls = []

    def transport(name):
        calls.append(name)
        return (404, "not found body")

    f, fc = _fetcher(transport, rate_per_sec=0, max_retries=3)
    assert f("gone") == (404, None)  # non-200 body nulled, no retry
    assert calls == ["gone"]
    assert fc.sleeps == []


def test_connection_errors_exhaust_to_status_zero():
    t = fetch.ReplayTransport({"dead": ["error"]})
    f, fc = _fetcher(t, rate_per_sec=0, max_retries=3)
    assert f("dead") == (0, None)
    assert fc.sleeps == [1.0, 2.0, 4.0]  # full backoff ladder, then give up


def test_429_backs_off_and_recovers():
    """A rate-limited response is transient, not terminal: the fetcher
    backs off 2^attempt and the eventual 200 body survives."""
    t = fetch.ReplayTransport({"busy": [429, 429, [200, "OK"]]})
    f, fc = _fetcher(t, rate_per_sec=0, max_retries=3)
    assert f("busy") == (200, "OK")
    assert fc.sleeps == [1.0, 2.0]


def test_429_exhausts_to_last_status():
    t = fetch.ReplayTransport({"swamped": [429]})
    f, fc = _fetcher(t, rate_per_sec=0, max_retries=2)
    assert f("swamped") == (429, None)
    assert fc.sleeps == [1.0, 2.0]


def test_5xx_exhausts_to_last_status():
    t = fetch.ReplayTransport({"down": [500]})
    f, fc = _fetcher(t, rate_per_sec=0, max_retries=2)
    assert f("down") == (500, None)  # final attempt returns the 5xx itself
    assert fc.sleeps == [1.0, 2.0]


def test_http_enrich_live_path_with_replay_transport(spark):
    """The live mapInPandas path end-to-end on a canned transcript: every
    outcome family in one frame. This is the exact code a real network run
    executes — only the transport differs."""
    doc_ok = json.dumps({"versions": {"1.0.0": {"dependencies": {"a": "1"}}}})
    doc_flaky = json.dumps({"versions": {"2.0.0": {}}})
    transcript = {
        "ok": [[200, doc_ok]],
        "flaky": [503, 503, [200, doc_flaky]],
        "dead": ["error"],
        # "missing" absent from the transcript -> 404
    }
    packages = spark.createDataFrame(
        [("ok",), ("missing",), ("flaky",), ("dead",)], PACKAGES_SCHEMA
    )
    rows = {
        r.name: (r.status_code, r.doc)
        for r in fetch.http_enrich(
            packages.coalesce(1),
            mode="live",
            transport=fetch.ReplayTransport(transcript),
            rate_per_sec=0,
            max_retries=2,
        ).collect()
    }
    assert rows["ok"] == (200, doc_ok)
    assert rows["missing"] == (404, None)
    assert rows["flaky"] == (200, doc_flaky)  # survived two 503s
    assert rows["dead"] == (0, None)  # connection errors exhausted


def test_registry_source_replay_mode(spark, tmp_path):
    """The npmregistry source's replay mode drives the same fetcher engine
    from a transcript file — the source-side live path, hermetic."""
    pkgs = tmp_path / "packages.txt"
    pkgs.write_text("alpha\nbeta\ngamma\n")
    transcript = {
        "alpha": [[200, '{"versions": {}}']],
        "beta": [502, [200, '{"versions": {}}']],
        # gamma absent -> 404
    }
    tpath = tmp_path / "transcript.json"
    tpath.write_text(json.dumps(transcript))
    register(spark)
    rows = {
        r.name: r.status_code
        for r in spark.read.format("npmregistry")
        .option("mode", "replay")
        .option("packages_path", str(pkgs))
        .option("transcript_path", str(tpath))
        .option("rate_per_sec", "0")
        .option("max_retries", "2")
        .option("numpartitions", "1")
        .load()
        .collect()
    }
    assert rows == {"alpha": 200, "beta": 200, "gamma": 404}


def test_replay_mode_survives_gzip_package_list(spark, tmp_path):
    """packages.txt.gz (the reference's input format, Main.scala:20-24)
    feeds the replay source identically."""
    import gzip

    gz = tmp_path / "packages.txt.gz"
    with gzip.open(gz, "wt") as f:
        f.write("only\n")
    tpath = tmp_path / "t.json"
    tpath.write_text(json.dumps({"only": [[200, "{}"]]}))
    register(spark)
    rows = (
        spark.read.format("npmregistry")
        .option("mode", "replay")
        .option("packages_path", str(gz))
        .option("transcript_path", str(tpath))
        .option("rate_per_sec", "0")
        .option("numpartitions", "1")
        .load()
        .collect()
    )
    assert [(r.name, r.status_code) for r in rows] == [("only", 200)]


def test_fetch_then_parse_pipeline_from_replay(spark):
    """Replayed live fetch feeds the downstream parse/count operators the
    same way fixture mode does — proving transports are interchangeable
    above the fetch boundary."""
    from pyspark.sql import functions as F

    from akkastreamprocessnpmpackagedependencies_spark.operators import npm

    doc = json.dumps(
        {
            "versions": {
                "1.0.0": {"dependencies": {"x": "1", "y": "2"}, "devDependencies": {"z": "3"}},
                "1.1.0": {"dependencies": {"x": "1"}},
            }
        }
    )
    packages = spark.createDataFrame([("lib",)], PACKAGES_SCHEMA)
    enriched = fetch.http_enrich(
        packages,
        mode="live",
        transport=fetch.ReplayTransport({"lib": [[200, doc]]}),
        rate_per_sec=0,
    )
    out = npm.report(
        npm.accumulate_counts(
            npm.count_dependencies(
                npm.explode_versions(
                    npm.parse_registry(enriched.filter(F.col("status_code") == 200))
                )
            )
        )
    ).collect()
    assert [(r[0], r[1], r[2], r[3]) for r in out] == [
        ("lib", "1.0.0", 2, 1),
        ("lib", "1.1.0", 1, 0),
    ]


def test_batch_reader_fetches_only_its_partition_slice(monkeypatch, tmp_path):
    """Review fix: in fetch modes each partition must fetch ITS stride of
    the package list, not the whole list (the old reader fetched the full
    throttled universe N times and discarded (N-1)/N of it)."""
    from akkastreamprocessnpmpackagedependencies_spark.sources import registry as reg

    calls = []

    def spy(options, names_override=None):
        calls.append(names_override)
        return [(n, 200, "{}") for n in (names_override or [])]

    monkeypatch.setattr(reg, "_load_docs", spy)
    p = tmp_path / "pkgs.txt"
    p.write_text("".join(f"p{i}\n" for i in range(7)))
    r = reg.NpmRegistryBatchReader(
        {
            "mode": "replay",
            "packages_path": str(p),
            "transcript_path": "unused",
            "numpartitions": "3",
        }
    )
    outs = [list(r.read(reg.InputPartition(i))) for i in range(3)]
    got = sorted(n for part in outs for (n, _, _) in part)
    assert got == sorted(f"p{i}" for i in range(7))
    # every fetch was slice-restricted, slices partition the universe
    assert all(ov is not None for ov in calls)
    assert sorted(len(ov) for ov in calls) == [2, 2, 3]
