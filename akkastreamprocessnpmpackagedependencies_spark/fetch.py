"""Batch HTTP enrichment: the reference's blocking per-element fetch
(reference: src/main/scala/NpmPackage.scala:7-22) as an Arrow-batched
``mapInPandas`` operator with per-partition session reuse, bounded
retry/backoff, a token-bucket rate cap, and null-on-failure (the engine's
PERMISSIVE error model replaces the reference's silent drop — failures stay
visible as status_code rows instead of vanishing).

Hermetic mode (default) resolves documents from a local mapping instead of
the network, so correctness never depends on registry availability.
"""

from __future__ import annotations

import time
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

RESULT_SCHEMA = "name string, status_code int, doc string"


def http_enrich(
    packages: DataFrame,
    *,
    mode: str = "fixture",
    docs: dict[str, tuple[int, str]] | None = None,
    rate_per_sec: float = 0.33,
    max_retries: int = 3,
) -> DataFrame:
    """packages(name) -> (name, status_code, doc).

    mode='fixture': look up ``docs`` (falls back to the committed fixture
    set). mode='live': GET https://registry.npmjs.org/<name> with one
    session per partition, exponential backoff on 5xx/connection errors,
    and a token bucket at ``rate_per_sec`` (the reference's 1-per-3s
    politeness; element-granular, unlike the micro-batch cap in the
    streaming source)."""
    if mode == "fixture" and docs is None:
        from .fixtures import registry_docs

        docs = {name: (code, doc) for name, code, doc in registry_docs()}

    def fixture_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resolved = pdf["name"].map(lambda n: docs.get(n))
            yield pd.DataFrame(
                {
                    "name": pdf["name"],
                    "status_code": resolved.map(lambda r: r[0] if r else 404).astype("int32"),
                    "doc": resolved.map(lambda r: r[1] if r else None),
                }
            )

    def live_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:  # pragma: no cover
        try:
            import requests
        except ImportError as e:
            raise NotImplementedError("live mode needs the 'requests' package") from e
        session = requests.Session()
        min_interval = 1.0 / rate_per_sec if rate_per_sec > 0 else 0.0
        last = [0.0]

        def fetch(name: str) -> tuple[int, str | None]:
            for attempt in range(max_retries + 1):
                wait = last[0] + min_interval - time.monotonic()
                if wait > 0:
                    time.sleep(wait)
                last[0] = time.monotonic()
                try:
                    r = session.get(f"https://registry.npmjs.org/{name}", timeout=30)
                except requests.RequestException:
                    if attempt == max_retries:
                        return (0, None)
                    time.sleep(2**attempt)
                    continue
                if r.status_code >= 500 and attempt < max_retries:
                    time.sleep(2**attempt)
                    continue
                return (r.status_code, r.text if r.status_code == 200 else None)
            return (0, None)

        for pdf in batches:
            results = pdf["name"].map(fetch)
            yield pd.DataFrame(
                {
                    "name": pdf["name"],
                    "status_code": results.map(lambda t: t[0]).astype("int32"),
                    "doc": results.map(lambda t: t[1]),
                }
            )

    fn = fixture_fn if mode == "fixture" else live_fn
    return packages.select("name").mapInPandas(fn, schema=RESULT_SCHEMA)
