"""File-format sources: round-trip fidelity vs the parquet truth, corrupt-line
quarantine, and columnar re-materialization."""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_streaming_etl_spark.catalog import load_tables
from flink_streaming_etl_spark.sources import files
from tests.conftest import SF_SMOKE

ORDERS_DDL = (
    "o_orderkey long, o_custkey long, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _orders(spark):
    return load_tables(spark, SF_SMOKE, register=False)["orders"]


def _sum_key(df):
    return df.agg(
        F.count(F.lit(1)).alias("n"), F.sum("o_orderkey").alias("s")
    ).collect()[0]


def test_csv_round_trip(spark, tmp_path):
    orders = _orders(spark)
    p = str(tmp_path / "orders_csv")
    orders.write.option("header", True).mode("overwrite").csv(p)
    back = files.read_csv(spark, p, ORDERS_DDL)
    clean, bad = files.split_corrupt(back)
    assert bad.count() == 0
    assert _sum_key(clean) == _sum_key(orders)
    assert clean.schema["o_orderdate"].dataType.typeName().startswith("timestamp")


def test_jsonl_round_trip_and_quarantine(spark, tmp_path):
    orders = _orders(spark).limit(100)
    p = str(tmp_path / "orders_json")
    orders.write.mode("overwrite").json(p)
    # poison one line (as its own file: Spark-written parts carry .crc
    # sidecars that reject in-place edits)
    with open(f"{p}/part-99999-poison.json", "w") as f:
        f.write('{"o_orderkey": notjson!!\n')
    back = files.read_jsonl(spark, p, ORDERS_DDL)
    clean, bad = files.split_corrupt(back)
    assert bad.count() == 1
    assert clean.count() == 100
    assert _sum_key(clean)["s"] == _sum_key(orders)["s"]


def test_orc_round_trip_keeps_pushdown(spark, tmp_path):
    from flink_streaming_etl_spark.plans import plan_text

    orders = _orders(spark)
    p = str(tmp_path / "orders_orc")
    orders.write.mode("overwrite").orc(p)
    back = files.read_orc(spark, p).filter(F.col("o_totalprice") > 100000.0)
    assert "PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice" in plan_text(back)
    assert back.count() == orders.filter(F.col("o_totalprice") > 100000.0).count()


def test_text_lands_columnar(spark, tmp_path):
    orders = _orders(spark)
    csv_p = str(tmp_path / "csv")
    orders.write.option("header", True).mode("overwrite").csv(csv_p)
    clean, _ = files.split_corrupt(files.read_csv(spark, csv_p, ORDERS_DDL))
    pq = str(tmp_path / "pq")
    files.to_columnar(clean, pq)
    again = files.read_parquet(spark, pq)
    assert _sum_key(again) == _sum_key(orders)
