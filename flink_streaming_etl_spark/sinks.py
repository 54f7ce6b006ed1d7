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
