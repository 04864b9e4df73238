"""Flagship query: per (package, version), count runtime and dev
dependencies — the reference's single end-to-end pipeline
(reference: src/main/scala/Main.scala:97-107), re-expressed as declarative
DataFrame transformations.

Stage-by-stage mapping (SURVEY.md §2):

- FileIO.fromPath + gunzip + utf8 + split lines (Main.scala:20-24)
    -> ``spark.read.text`` (handles .gz transparently, line-delimited)
- map(NpmPackage) (Main.scala:25)                 -> column alias
- throttle/buffer (Main.scala:32,100,104)         -> streaming source options
- fetchDependencies HTTP+parse (NpmPackage.scala:7-22)
    -> hermetic join to frozen docs (or fetch.http_enrich), then
       PERMISSIVE ``from_json`` — missing keys become NULLs, replacing
       the reference's swallowed exceptions
- mapConcat(versionList) (Main.scala:37-38)       -> ``explode`` of the versions map
- Broadcast/Zip/Balance/Merge count graph (Main.scala:40-80)
    -> one projection with two column expressions; parallelism is the
       runtime's job (partition-level), not hand-wired graph topology
- Flow.fold into nested mutable map (Main.scala:82-86)
    -> groupBy(package, version) agg; last-writer-wins upsert
       (AccumulatedDependencyCount.scala:8-12) == any value-equivalent agg
- ordered console report (Main.scala:88-95)       -> ORDER BY package, version

Scale: no driver-side state anywhere; the "accumulator" is a distributed
hash aggregation that spills; the docs join broadcasts only when the docs
side is small (Catalyst/AQE decides above the hint threshold).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schemas import REGISTRY_SCHEMA


def load_package_list(spark: SparkSession, path: str) -> DataFrame:
    """S1-S4: file scan + gunzip + decode + line split, in one reader.
    Spark's text source auto-decodes .gz by extension (single-partition,
    serial — the same behavior as the reference's streaming gunzip)."""
    return spark.read.text(path).select(F.trim("value").alias("name")).filter(F.length("name") > 0)


def attach_registry_docs(packages: DataFrame, docs: DataFrame) -> DataFrame:
    """P2 (hermetic half): replace the live HTTP fetch with an equi-join to
    frozen response rows. Non-200 responses are dropped exactly like the
    status gate at NpmPackage.scala:9. The docs side is the smaller dim in
    the fixture world; at scale both sides shuffle-hash-join on ``name``."""
    return packages.join(docs, "name", "inner").filter(F.col("status_code") == 200)


def parse_registry(df: DataFrame, doc_col: str = "doc") -> DataFrame:
    """P2 (parse half): ujson.read -> PERMISSIVE from_json. Malformed docs
    and absent keys yield NULLs instead of exceptions."""
    return df.withColumn("parsed", F.from_json(F.col(doc_col), REGISTRY_SCHEMA))


def explode_versions(df: DataFrame) -> DataFrame:
    """P3: mapConcat(versionList) -> explode over the versions MapType.
    Packages whose doc lacks a usable ``versions`` object contribute no
    rows (inner explode of NULL map = drop), matching the swallow at
    NpmPackage.scala:17-19."""
    return df.select(
        F.col("name").alias("package"),
        F.explode("parsed.versions").alias("version", "vdoc"),
    )


def count_dependencies(df: DataFrame) -> DataFrame:
    """P4-P7 + G2/G3 collapsed: the reference broadcasts each version to two
    counter branches and zips the pair back together (Main.scala:46-61);
    in a DAG engine that is simply two column expressions in one select.
    ``coalesce(map_keys(...), array())`` reproduces the missing-key -> 0
    semantics (Version.scala:10-12, 18-20)."""
    empty = F.array().cast("array<string>")
    return df.select(
        "package",
        "version",
        F.size(F.coalesce(F.map_keys("vdoc.dependencies"), empty)).cast("long").alias("dependencies"),
        F.size(F.coalesce(F.map_keys("vdoc.devDependencies"), empty)).cast("long").alias("devDependencies"),
    )


def accumulate_counts(df: DataFrame) -> DataFrame:
    """A1: Flow.fold's nested mutable map -> distributed hash aggregation.
    Each (package, version) key carries one value per upstream row and the
    reference's map-insert is last-writer-wins, so ``max`` is
    value-equivalent and partial-aggregates map-side. Works identically in
    streaming `complete` mode, where Spark's state store replaces the
    hand-rolled heap map (scale ceiling of the reference)."""
    return df.groupBy("package", "version").agg(
        F.max("dependencies").alias("dependencies"),
        F.max("devDependencies").alias("devDependencies"),
    )


def report(df: DataFrame) -> DataFrame:
    """K1: the fold-then-nested-print exists to group output by package
    (PDF p.2); declaratively that intent is ORDER BY package, version."""
    return df.orderBy("package", "version")


def nested_report(df: DataFrame) -> DataFrame:
    """Optional: materialize the reference's literal nested shape
    package -> version -> (runtime, dev) (AccumulatedDependencyCount.scala:4)
    as a MapType column, for API parity."""
    return (
        df.groupBy("package")
        .agg(
            F.map_from_entries(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "version",
                            F.struct(
                                F.col("dependencies").alias("runtime"),
                                F.col("devDependencies").alias("dev"),
                            ),
                        )
                    )
                )
            ).alias("versions")
        )
        .orderBy("package")
    )


def dependency_counts(packages: DataFrame, docs: DataFrame) -> DataFrame:
    """The full flagship pipeline, hermetic batch form."""
    return report(
        accumulate_counts(
            count_dependencies(explode_versions(parse_registry(attach_registry_docs(packages, docs))))
        )
    )
