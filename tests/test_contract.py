"""Driver-contract guards: the invariants the correctness gate depends on."""

from __future__ import annotations

import __spark_entry__ as entrymod

ROWS_ONLY_ALLOWED = {"approx_sketches", "kmeans_clusters"}  # documented exemptions


def test_every_query_is_oracled_or_documented_rows_only():
    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    missing = set(qs) - set(oracles)
    assert missing <= ROWS_ONLY_ALLOWED, f"undocumented rows-only queries: {missing - ROWS_ONLY_ALLOWED}"
    assert set(oracles) <= set(qs), "oracle without a query"


def test_query_names_are_stable_identifiers():
    for name in entrymod.queries():
        assert name.replace("_", "").isalnum() and name == name.lower()


def test_entry_runs_and_is_stable(spark):
    out = entrymod.entry(spark)
    rows = out.collect()
    assert len(rows) == 20  # hermetic fixture world is fixed-size
    assert out.columns == ["package", "version", "dependencies", "devDependencies"]
