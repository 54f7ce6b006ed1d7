"""Batch sinks: partitioned and bucketed parquet writers.

The reference's only sink is the ES-7 upsert index (flink-ddl.sql:96-176 →
streaming/upsert_sink.py). An analytics engine also needs lake-layout
writers, and at 100 TB the layout IS the performance model:

- ``write_partitioned``: hive-style directory partitioning on low-cardinality
  columns → partition pruning at read time (a `WHERE lang='en'` scan touches
  one directory).
- ``write_bucketed``: pre-shuffles into N buckets by join/agg key at write
  time, so every later join or groupBy on that key is exchange-free — pay
  the shuffle once, reuse it forever. This is Spark's answer to the
  reference's keyed-changelog topics (Kafka key = PK struct,
  sample/cdc.orders.change-log-mysql.json:1-15): co-location by key as a
  storage property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame, path: str, partition_by: list[str], mode: str = "overwrite"
) -> None:
    """Hive-layout parquet: one directory tree level per partition column.
    Caller is responsible for choosing low-cardinality columns — a
    high-cardinality partition key (doc_id!) creates millions of tiny files
    and kills the namenode before it kills Spark."""
    df.write.mode(mode).partitionBy(*partition_by).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    path: str,
    bucket_by: str,
    n_buckets: int = 8,
    mode: str = "overwrite",
) -> None:
    """Bucketed + sorted external table: rows hash to ``n_buckets`` files by
    ``bucket_by``; readers joining two tables bucketed the same way skip the
    exchange entirely (tests/test_sinks.py pins the exchange-free plan)."""
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, bucket_by)
        .sortBy(bucket_by)
        .option("path", path)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# ---------------------------------------------------------------------------
# Z-order (Morton) clustering — multi-column data skipping. Directory
# partitioning prunes on ONE column; bucketing co-locates ONE key. When
# reads filter on TWO range dimensions (user_id AND day; lat AND lon),
# interleaving the bits of both keys into one Morton code and range-
# partitioning files by that code gives every file a tight min/max envelope
# on BOTH columns — parquet row-group stats then skip most files for a
# point/range predicate on either dimension. This is the layout trick
# behind Delta OPTIMIZE ZORDER BY, expressed with nothing but built-in
# bit arithmetic + repartitionByRange.

from pyspark.sql import Column
from pyspark.sql import functions as F

_Z_BITS = 16  # per-dimension bits: 2^16 rank buckets per column


def _morton2(a: Column, b: Column, bits: int = _Z_BITS) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints (a even
    positions, b odd) — pure codegen'd shift/mask arithmetic."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return z


def zorder_rank(df: DataFrame, col_a: str, col_b: str) -> Column:
    """Morton code over per-column *ranks* (percent_rank scaled to 2^bits)
    so arbitrary numeric distributions interleave uniformly. Rank columns
    cost one window each over the full data — at 100 TB replace with a
    sampled quantile map (approxQuantile on a 1% sample → broadcast
    piecewise bucketizer): same envelope quality, no global sort."""
    from pyspark.sql.window import Window

    scale = (1 << _Z_BITS) - 1
    ra = F.floor(F.percent_rank().over(Window.orderBy(col_a)) * scale).cast("long")
    rb = F.floor(F.percent_rank().over(Window.orderBy(col_b)) * scale).cast("long")
    return _morton2(ra, rb)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    mode: str = "overwrite",
) -> None:
    """Write parquet clustered by the 2-D Morton code of (col_a, col_b):
    repartitionByRange on the code gives each output file a contiguous
    Z-curve segment → tight per-file min/max on BOTH columns (verified by
    tests/test_sinks.py: per-file envelope width shrinks vs a random
    layout, which is exactly what row-group skipping consumes)."""
    (
        df.withColumn("_z", zorder_rank(df, col_a, col_b))
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact(
    spark: SparkSession, path: str, target_files: int = 8, order_by: str | None = None
) -> tuple[int, int]:
    """Small-file compaction — the maintenance op every continuously-written
    sink needs (a micro-batch upsert sink accretes one file set per batch;
    thousands of KB-files make the scan planner, not the scan, the
    bottleneck). Rewrites ``path`` into ``target_files`` files, optionally
    re-sorting (restores a Z-order/bucket clustering degraded by appends).
    Returns (files_before, files_after).

    The swap is rename-aside (live → ``.compact_old``, tmp → live, rm old):
    a complete file set exists on disk at every instant and both crash
    windows recover with a single rename — before the second rename the
    new set is intact at ``.compact_tmp``, after it the old set is intact
    at ``.compact_old``. (Not a true atomic swap: a reader racing the two
    renames can observe a missing directory for a syscall-wide window; at
    100 TB compaction runs per partition directory under the table-format
    commit protocol, which is what provides reader isolation.)"""
    import glob
    import os
    import shutil

    before = len(glob.glob(os.path.join(path, "*.parquet")))
    df = spark.read.parquet(path)
    out = df.repartition(target_files)
    if order_by is not None:
        out = out.sortWithinPartitions(order_by)
    tmp = path + ".compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    old = path + ".compact_old"
    if os.path.exists(old):  # leftover from a crashed prior run
        shutil.rmtree(old)
    os.replace(path, old)
    os.replace(tmp, path)
    shutil.rmtree(old)
    after = len(glob.glob(os.path.join(path, "*.parquet")))
    return before, after
