"""Declared StructType schemas.

The reference navigates the npm registry JSON dynamically with ujson and
string keys (reference: src/main/scala/NpmPackage.scala:10-16,
Version.scala:4-20); missing keys throw and are silently swallowed. Here the
same shape is a declared schema: open-keyed JSON objects (``versions``,
``dependencies``, ``devDependencies``) become ``MapType(String, ...)`` —
exactly "an object with arbitrary keys" — and absent keys become NULL columns
under PERMISSIVE ``from_json`` instead of exceptions.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Per-version document: only the fields the reference reads
# (Version.scala:4 name, :7 dependencies, :15 devDependencies).
VERSION_DOC_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("dependencies", T.MapType(T.StringType(), T.StringType())),
        T.StructField("devDependencies", T.MapType(T.StringType(), T.StringType())),
    ]
)

# Whole registry document for one package (NpmPackage.scala:10-13).
REGISTRY_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType()),
        T.StructField("versions", T.MapType(T.StringType(), VERSION_DOC_SCHEMA)),
    ]
)

# F2 fixture table: frozen registry HTTP responses (FIXTURES.md).
REGISTRY_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("status_code", T.IntegerType(), False),
        T.StructField("doc", T.StringType()),
    ]
)

# F1 fixture table: the input package list (packages.txt.gz analogue).
PACKAGES_SCHEMA = T.StructType([T.StructField("name", T.StringType(), False)])

# Flagship query output: one row per (package, version) with LongType counts
# (IntegerType in the reference, DependencyCount.scala:4-5 — widened for
# 100 TB-scale safety per SURVEY.md §1.2).
DEPENDENCY_COUNTS_SCHEMA = T.StructType(
    [
        T.StructField("package", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("dependencies", T.LongType(), False),
        T.StructField("devDependencies", T.LongType(), False),
    ]
)

# F4 fixture: package names replayed as a stream with event time.
NPM_EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("seq", T.LongType(), False),
        T.StructField("ts", T.TimestampType(), False),
        T.StructField("name", T.StringType(), False),
    ]
)
