"""Lake-layout sinks: partition pruning and exchange-free bucketed joins —
the write-side half of the 100 TB story."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_etl_spark.catalog import load_tables
from flink_streaming_etl_spark import sinks
from flink_streaming_etl_spark.plans import plan_text
from tests.conftest import SF_SMOKE


def test_partitioned_write_prunes_at_read(spark, tmp_path):
    docs = load_tables(spark, SF_SMOKE, register=False)["documents"]
    out = str(tmp_path / "docs_by_lang")
    sinks.write_partitioned(docs, out, ["lang"])
    back = spark.read.parquet(out).filter(F.col("lang") == "en")
    p = plan_text(back)
    # Partition filter must prune directories, not scan-and-filter.
    assert "PartitionFilters: [isnotnull(lang" in p, p
    want = docs.filter(F.col("lang") == "en").count()
    assert back.count() == want


def test_bucketed_join_is_exchange_free(spark, tmp_path):
    t = load_tables(spark, SF_SMOKE, register=False)
    try:
        sinks.write_bucketed(
            t["orders"], "b_orders", str(tmp_path / "b_orders"), "o_custkey"
        )
        sinks.write_bucketed(
            t["customer"].withColumnRenamed("c_custkey", "o_custkey"),
            "b_customer",
            str(tmp_path / "b_customer"),
            "o_custkey",
        )
        joined = (
            sinks.read_table(spark, "b_orders")
            .join(sinks.read_table(spark, "b_customer").hint("merge"), "o_custkey")
            .select("o_orderkey", "c_name")
        )
        p = plan_text(joined)
        assert "Exchange" not in p, p
        assert joined.count() == t["orders"].count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_bucketed_aggregation_is_exchange_free(spark, tmp_path):
    t = load_tables(spark, SF_SMOKE, register=False)
    try:
        sinks.write_bucketed(
            t["orders"], "b_orders_agg", str(tmp_path / "b_orders_agg"), "o_custkey"
        )
        agg = (
            sinks.read_table(spark, "b_orders_agg")
            .groupBy("o_custkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        p = plan_text(agg)
        assert "Exchange" not in p, p
        assert agg.count() == t["orders"].select("o_custkey").distinct().count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders_agg")


def test_zorder_layout_tightens_both_envelopes(spark, tmp_path):
    """Z-ordered files must carry tighter per-file min/max envelopes on BOTH
    cluster columns than a random layout — the statistic row-group skipping
    consumes. Also: same rows, just reordered."""
    t = load_tables(spark, SF_SMOKE, register=False)
    ev = t["events"].select("event_id", "user_id", "value")

    z_path = str(tmp_path / "z")
    r_path = str(tmp_path / "r")
    sinks.write_zordered(ev, z_path, "user_id", "value", n_files=8)
    ev.repartition(8).write.parquet(r_path)  # round-robin: the anti-layout

    def mean_envelope(path: str, col: str) -> float:
        per_file = (
            spark.read.parquet(path)
            .groupBy(F.input_file_name())
            .agg((F.max(col) - F.min(col)).alias("w"))
        )
        return per_file.agg(F.avg("w")).collect()[0][0]

    for col in ["user_id", "value"]:
        z_w, r_w = mean_envelope(z_path, col), mean_envelope(r_path, col)
        # each file should cover a strict subrange on each dimension; random
        # layout covers ~the full range in every file
        assert z_w < 0.8 * r_w, (col, z_w, r_w)

    got = spark.read.parquet(z_path)
    assert got.count() == ev.count()
    assert got.select(F.sum("event_id")).collect() == ev.select(F.sum("event_id")).collect()


def test_compact_shrinks_files_keeps_rows(spark, tmp_path):
    """Compaction: many small files → target_files, identical data."""
    t = load_tables(spark, SF_SMOKE, register=False)
    path = str(tmp_path / "fragmented")
    ev = t["events"].select("event_id", "user_id", "value")
    ev.repartition(64).write.parquet(path)  # simulate per-batch accretion

    before, after = sinks.compact(spark, path, target_files=4)
    assert before >= 32 and after == 4, (before, after)
    got = spark.read.parquet(path)
    assert got.count() == ev.count()
    assert got.agg(F.sum("event_id")).collect() == ev.agg(F.sum("event_id")).collect()
