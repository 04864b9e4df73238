"""Generalized source/sink surface: schema-on-read text/CSV/JSON sources
(including transparent .gz, the reference's file format — reference:
src/main/scala/Main.scala:20-24 reads a gzipped line file), and the
scale-path sinks: partitioned parquet (partition pruning at read time) and
bucketed tables (shuffle-free co-located joins).

Scale design (100 TB):
- every reader takes an explicit ``StructType`` — schema inference is a
  full extra pass over the data and is banned from the hot path;
- ``write_partitioned`` is the standard layout for fact tables: low-
  cardinality partition columns become directories, so a filtered read
  plans only the matching files (PartitionFilters, zero I/O for the rest);
- ``write_bucketed`` pre-shuffles ONCE at write time: two tables bucketed
  on the same key x bucket count join with no Exchange on either side —
  the repeated-join amortization Spark offers in place of co-located
  storage;
- ``compact`` controls output file count/size (the small-files problem):
  AQE-coalesced shuffle writes or an explicit repartition to target file
  sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line source (plain or .gz by extension — gzip decode, UTF-8 decode
    and line split are all inside the scan). One column: ``value``.
    Replaces the reference's FileIO → gunzip → utf8 → split-lines chain
    (src/main/scala/Main.scala:20-24) with a single declarative scan.
    A .gz file is non-splittable so it scans as one task — identical
    serial semantics to the reference; at scale store many files."""
    return spark.read.text(path)


def read_csv(spark: SparkSession, path: str, schema: StructType, **options) -> DataFrame:
    """CSV scan with a declared schema (no inference pass)."""
    return spark.read.options(header="true", **options).schema(schema).csv(path)


def read_json(spark: SparkSession, path: str, schema: StructType, **options) -> DataFrame:
    """JSON-lines scan with a declared schema, PERMISSIVE by default —
    absent keys become nulls, the engine-level version of the reference's
    swallow-and-continue JSON handling (src/main/scala/Version.scala:10-12)."""
    return spark.read.options(mode="PERMISSIVE", **options).schema(schema).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", "true").csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned parquet sink. ``partition_cols`` must be low-cardinality
    (each distinct combination is a directory); a read filtered on them
    prunes whole directories before any I/O. ``max_records_per_file``
    bounds file size without an extra shuffle."""
    w = df.write.mode(mode).partitionBy(*partition_cols)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.parquet(path)


def compact(df: DataFrame, target_partitions: int) -> DataFrame:
    """Bound output file count before a write. Uses ``coalesce`` (narrow,
    no shuffle) when shrinking; ``repartition`` only when growing."""
    n = df.rdd.getNumPartitions()
    if target_partitions < n:
        return df.coalesce(target_partitions)
    if target_partitions > n:
        return df.repartition(target_partitions)
    return df


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted managed table: the write shuffles on
    ``bucket_col`` once; every later equi-join or aggregation on that key
    between same-bucketed tables runs with NO Exchange (the physical plan
    shows SortMergeJoin directly over the scans). This is the 100 TB answer
    to repeated fact-fact joins."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def scan_has_partition_filter(df: DataFrame, col: str) -> bool:
    """True if the physical scan prunes on ``col`` via PartitionFilters —
    the assertion that a partitioned layout actually short-circuits I/O."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line and col in line.split("PartitionFilters", 1)[1].split("]", 1)[0]:
            return True
    return False


def scan_files_read(df: DataFrame) -> int:
    """Execute ``df`` and return how many files its file scan(s) actually
    selected after partition pruning — the runtime ``numFiles`` metric of
    every scan leaf, summed. The I/O-level twin of
    ``scan_has_partition_filter``: that helper pins the plan SHAPE (a
    PartitionFilters entry), this one pins the measured effect (fewer
    files touched than the table holds). Raises if the plan has no file
    scan, so a refactor that silently drops the scan can't pass a
    pruning assertion vacuously."""
    df.collect()  # run the query so scan metrics are populated
    total, found = 0, False

    def walk(node) -> None:
        nonlocal total, found
        cls = node.getClass().getSimpleName()
        # AQE wrappers are LeafExecNodes whose real subtree hangs off a
        # dedicated accessor, so a collectLeaves() walk would stop AT
        # the wrapper and miss every scan inside it (review finding:
        # any aggregated/joined frame under AQE raised spuriously)
        if cls == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if cls.endswith("QueryStageExec"):
            walk(node.plan())
            return
        ms = node.metrics()
        if ms.contains("numFiles"):
            total += int(ms.apply("numFiles").value())
            found = True
        kids = node.children()
        for i in range(kids.size()):
            walk(kids.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    if not found:
        raise ValueError("plan has no file scan with a numFiles metric")
    return total


def plan_exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(1 for line in plan.splitlines() if "Exchange" in line and "Reused" not in line)


def gzip_lines_roundtrip_count(spark: SparkSession, path: str) -> int:
    """Convenience: number of non-empty lines in a (possibly gzipped) text
    file — the reference's source stage as one expression."""
    return read_lines(spark, path).filter(F.length(F.trim("value")) > 0).count()


def write_sorted_for_zone_maps(
    df: DataFrame, path: str, sort_cols: list[str], n_files: int = 4, mode: str = "overwrite"
) -> None:
    """Range-cluster rows across and within output files so parquet
    min/max statistics (zone maps) become selective: ``repartitionByRange``
    gives each file a disjoint slice of the sort-key range (one range
    shuffle), ``sortWithinPartitions`` orders rows inside it (narrow, no
    shuffle), and a reader filtering on the sort column skips every file
    and row group whose range misses the predicate. Without the range
    step every file spans the whole key range and the stats prune
    nothing."""
    (
        df.repartitionByRange(n_files, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .write.mode(mode)
        .parquet(path)
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int = 8,
    seed: int = 42,
    mode: str = "overwrite",
) -> None:
    """Deterministic global-shuffle export into N balanced shards — the
    last step of a training-data pipeline (dedup -> quality filter ->
    pack_sequences -> THIS). Trainers need (a) a pseudo-random row order
    decorrelated from ingest order, (b) equal-sized shards for data-
    parallel readers, (c) bit-identical reruns. All three come from one
    seeded hash: shard = xxhash64(key, seed) mod N balances by the law of
    large numbers whatever the key skew; rows sort within a shard by an
    independent second hash (seed+1), so the order is shuffled yet
    reproducible — no rand(), no nondeterministic repartition round-robin.

    Cost at 100 TB: ONE hash exchange on the shard column (the text
    moves exactly once) + a narrow in-partition sort; the write fans out
    one directory per shard for per-reader file lists.

    Determinism requires ``key_col`` to be UNIQUE (rows sharing a key get
    identical (shard, _ord, key) sort keys, leaving their mutual order to
    shuffle arrival) — run exact dedup first, which a training export
    does anyway; shard BALANCE tolerates key skew, reproducibility does
    not."""
    shard = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed)), F.lit(n_shards)).alias("shard")
    order = F.pmod(F.xxhash64(F.col(key_col), F.lit(seed + 1)), F.lit(1 << 40))
    (
        df.withColumn("shard", shard)
        .withColumn("_ord", order)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord", key_col)
        .drop("_ord")
        .write.mode(mode)
        .partitionBy("shard")
        .parquet(path)
    )


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 4,
    mode: str = "overwrite",
) -> None:
    """Z-order clustered layout: range-partition and sort by the Morton
    interleave of two key columns (functions/layout.py), so EVERY output
    file covers a small rectangle of the 2-D key space and parquet
    min/max zone maps prune on either dimension. The single-column
    variant (write_sorted_for_zone_maps) leaves the second column
    unclustered — a predicate on it scans every file. One range shuffle
    + narrow in-partition sort, same cost shape as the 1-D layout.

    Dimensions are NORMALIZED to the full 16-bit scale from their actual
    min/max before interleaving (one tiny pre-aggregation — the same
    trick Delta's OPTIMIZE ZORDER uses via per-column range ids): raw
    interleave of unequal-cardinality keys degenerates to sorting by the
    wider key alone, because the narrow key's high bits are constant
    zero and never reach the curve's top bits."""
    from ..functions.layout import MORTON_MASK, morton_key

    st = df.agg(
        F.min(x_col).alias("xl"), F.max(x_col).alias("xh"),
        F.min(y_col).alias("yl"), F.max(y_col).alias("yh"),
    ).first()
    if st.xl is None or st.yl is None:  # empty input: nothing to cluster
        df.write.mode(mode).parquet(path)
        return

    def scaled(col: str, lo, hi):
        # Overflow-safe normalization (review fix): the old form computed
        # (delta * 65535) / span with int64 multiply + double divide,
        # which WRAPS for wide key ranges (delta > 2^63/65535, e.g.
        # epoch-nanos keys) and silently scrambles every z-key. Instead:
        # a driver-computed exact bucket width w = ceil(span / 65536)
        # and a pre-shift keeping delta within double's exact-integer
        # range, then scaled = delta DIV w — no executor-side multiply
        # can overflow. (A 1-ulp floor edge on the division moves a
        # boundary row one cell — harmless for a storage layout.)
        span = max(1, int(hi) - int(lo))
        shift = 0
        while (span >> shift) > (1 << 37):  # keep delta*MASK within 2^53
            shift += 1
        red_span = max(1, span >> shift)
        delta = F.shiftright((F.col(col) - F.lit(int(lo))).cast("long"), shift)
        return F.least(
            F.lit(MORTON_MASK),
            F.floor(delta * F.lit(MORTON_MASK) / F.lit(red_span)),
        )

    z = morton_key(scaled(x_col, st.xl, st.xh), scaled(y_col, st.yl, st.yh))
    (
        df.withColumn("__zkey", z)
        .repartitionByRange(n_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode(mode)
        .parquet(path)
    )
