"""Golden tests for the flagship NPM dependency-count pipeline.

The golden rows come from an independent plain-Python implementation
(fixtures.expected_counts) — not from Spark — so a Spark-side semantic
bug cannot self-verify. Edge cases pin the reference behaviors listed in
FIXTURES.md (missing keys, non-200, malformed JSON, shared semver, ...).
"""

from __future__ import annotations

import gzip
import os

from pyspark.sql import functions as F

from akkastreamprocessnpmpackagedependencies_spark import fixtures
from akkastreamprocessnpmpackagedependencies_spark.operators import npm
from akkastreamprocessnpmpackagedependencies_spark.schemas import (
    PACKAGES_SCHEMA,
    REGISTRY_DOCS_SCHEMA,
)


def _inputs(spark):
    packages = spark.createDataFrame([(n,) for n in fixtures.package_names()], PACKAGES_SCHEMA)
    docs = spark.createDataFrame(fixtures.registry_docs(), REGISTRY_DOCS_SCHEMA)
    return packages, docs


def test_flagship_matches_golden(spark):
    packages, docs = _inputs(spark)
    got = [tuple(r) for r in npm.dependency_counts(packages, docs).collect()]
    assert got == fixtures.expected_counts()


def test_source_pipeline_reads_gzip(spark, tmp_path):
    # S1-S4: file scan + gunzip + utf8 decode + line split in one reader,
    # byte-identical to the reference's source chain (Main.scala:20-24).
    path = os.path.join(tmp_path, "packages.txt.gz")
    with gzip.open(path, "wt") as f:
        f.write("\n".join(fixtures.package_names()) + "\n")
    names = [r.name for r in npm.load_package_list(spark, path).collect()]
    assert sorted(names) == sorted(fixtures.package_names())


def test_non200_and_missing_docs_yield_no_rows(spark):
    packages, docs = _inputs(spark)
    out = npm.dependency_counts(packages, docs)
    pkgs = {r.package for r in out.select("package").distinct().collect()}
    assert "eta" not in pkgs  # 404 (NpmPackage.scala:9)
    assert "no-such-package" not in pkgs  # never fetched
    assert "epsilon" not in pkgs  # no versions key (NpmPackage.scala:17-19)
    assert "zeta" not in pkgs  # versions not an object
    assert "kappa" not in pkgs  # malformed JSON


def test_missing_dep_keys_count_zero(spark):
    packages, docs = _inputs(spark)
    rows = {(r.package, r.version): (r.dependencies, r.devDependencies)
            for r in npm.dependency_counts(packages, docs).collect()}
    assert rows[("beta", "0.1.0")] == (0, 1)  # no dependencies key
    assert rows[("gamma", "2.0.0")] == (1, 0)  # no devDependencies key
    assert rows[("delta", "3.3.3")] == (0, 0)  # empty {} objects


def test_shared_semver_groups_on_package_and_version(spark):
    packages, docs = _inputs(spark)
    rows = {(r.package, r.version): (r.dependencies, r.devDependencies)
            for r in npm.dependency_counts(packages, docs).collect()}
    assert rows[("alpha", "1.0.0")] == (2, 1)
    assert rows[("iota", "1.0.0")] == (3, 1)


def test_nested_report_shape(spark):
    # API parity with the reference's nested accumulator map
    # (AccumulatedDependencyCount.scala:4).
    packages, docs = _inputs(spark)
    flat = npm.accumulate_counts(
        npm.count_dependencies(
            npm.explode_versions(npm.parse_registry(npm.attach_registry_docs(packages, docs)))
        )
    )
    nested = {r.package: r.versions for r in npm.nested_report(flat).collect()}
    assert nested["alpha"]["1.1.0"] == (3, 2)
    assert len(nested["theta"]) == 12


def test_fixture_parquet_matches_inline(spark, fixtures_dir):
    # The committed parquet fixtures (DuckDB oracle inputs) stay in sync
    # with the inline definitions.
    docs_pq = spark.read.parquet(os.path.join(fixtures_dir, "npm_registry_docs.parquet"))
    assert docs_pq.count() == len(fixtures.registry_docs())
    golden_pq = spark.read.parquet(os.path.join(fixtures_dir, "npm_expected_counts.parquet"))
    got = [tuple(r) for r in golden_pq.orderBy("package", "version").collect()]
    assert got == fixtures.expected_counts()


def test_pagerank_mass_conserved_and_hubs_rank_high(spark):
    """Power-iteration invariants: ranks are positive, total mass stays ~1
    (the decimal quantization bounds the drift per round), and the most
    depended-upon package outranks every package nothing depends on."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    pr = {r.node: r.pr for r in entry._npm_dependency_pagerank(spark, "").collect()}
    assert len(pr) == 34
    assert all(v > 0 for v in pr.values())
    total = sum(pr.values())
    assert abs(total - 1.0) < 1e-3
    # in-degree from the same fixture edges
    docs = spark.read.parquet(
        entry.os.path.join(entry.FIXTURES_DIR, "npm_registry_docs.parquet")
    )
    from akkastreamprocessnpmpackagedependencies_spark.operators import npm as npm_ops

    ver = npm_ops.explode_versions(
        npm_ops.parse_registry(docs.filter(F.col("status_code") == 200))
    )
    empty = F.array().cast("array<string>")
    edges = (
        ver.select(F.col("package").alias("src"),
                   F.explode(F.coalesce(F.map_keys("vdoc.dependencies"), empty)).alias("dst"))
        .unionAll(ver.select(F.col("package").alias("src"),
                             F.explode(F.coalesce(F.map_keys("vdoc.devDependencies"), empty)).alias("dst")))
        .distinct()
    )
    indeg = {r.dst: r.n for r in edges.groupBy("dst").agg(F.count("*").alias("n")).collect()}
    top_target = max(indeg, key=indeg.get)
    sources_only = [n for n in pr if n not in indeg]
    assert sources_only, "fixture graph should have un-depended-upon packages"
    assert all(pr[top_target] > pr[s] for s in sources_only)
