"""Round-11 additions: bounded streaming data-quality state, the
rfm_segmentation approx-threshold scale regime, retractable
LISTAGG/COLLECT, touched-bucket state saves, and the r10 ADVICE fixes."""

import pyspark.sql
import pytest
from pyspark.sql import functions as F

from flink_streaming_etl_spark.catalog import load_tables
from tests.conftest import SF_SMOKE


def _tables(spark):
    return load_tables(spark, SF_SMOKE, register=False)


# ---------------------------------------------------------------------------
# DataQualityAccumulator: bounded state, O(1) driver transfer (r10 verdict #1)


def test_data_quality_accumulator_driver_transfer_is_scalar(spark, monkeypatch):
    """add_batch must never collect a row set to the driver — only
    scalar aggregates (first()/count()). The seen-key state lives as a
    distributed relation, so driver memory is O(1) in corpus size."""
    from flink_streaming_etl_spark.streaming.data_quality import (
        DataQualityAccumulator,
    )

    t = _tables(spark)
    orders, customer = t["orders"], t["customer"]
    dim = {r["c_custkey"] for r in customer.select("c_custkey").collect()}
    batch = spark.createDataFrame(orders.limit(40).collect(), orders.schema)

    acc = DataQualityAccumulator(dim_keys=dim)

    def _no_collect(self):
        raise AssertionError("add_batch collected a row set to the driver")

    monkeypatch.setattr(pyspark.sql.DataFrame, "collect", _no_collect)
    monkeypatch.setattr(pyspark.sql.DataFrame, "toLocalIterator", _no_collect)
    acc.add_batch(batch, batch_id=0)
    acc.add_batch(batch, batch_id=1)  # second batch exercises the seen join
    monkeypatch.undo()

    assert acc.n_rows == 80
    # every key of batch 1 was already seen -> all 40 rows are dups, plus
    # 0 within-batch dups in batch 0
    assert acc.violations["orderkey_unique"] == 40
    # internal state is a DataFrame relation, not a Python set
    assert isinstance(acc._seen, pyspark.sql.DataFrame)
    assert not hasattr(acc, "seen_keys")


def test_data_quality_accumulator_null_keys_match_batch(spark):
    """NULL o_orderkey rows all count as uniqueness violations, exactly
    the batch operator's n_rows - count_distinct(key) rule (ADVICE r10),
    and n_custkey NULLs as completeness violations."""
    from flink_streaming_etl_spark.operators import analytics as an
    from flink_streaming_etl_spark.streaming.data_quality import (
        DataQualityAccumulator,
    )

    t = _tables(spark)
    orders, customer = t["orders"], t["customer"]
    rows = orders.orderBy("o_orderkey").limit(20).collect()
    nulled = [
        # three NULL-keyed rows, split across batches
        {**rows[0].asDict(), "o_orderkey": None},
        {**rows[1].asDict(), "o_orderkey": None},
        {**rows[2].asDict(), "o_orderkey": None},
    ]
    b0 = rows[:10] + [pyspark.sql.Row(**nulled[0])]
    b1 = rows[10:] + [pyspark.sql.Row(**nulled[1]), pyspark.sql.Row(**nulled[2])]
    dim = {r["c_custkey"] for r in customer.select("c_custkey").collect()}

    acc = DataQualityAccumulator(dim_keys=dim)
    acc.add_batch(spark.createDataFrame(b0, orders.schema), batch_id=0)
    acc.add_batch(spark.createDataFrame(b1, orders.schema), batch_id=1)

    union = spark.createDataFrame(b0 + b1, orders.schema)
    want = sorted(tuple(r) for r in an.data_quality_report(union, customer).collect())
    got = sorted(tuple(r) for r in acc.result(spark).collect())
    assert got == want
    assert acc.violations["orderkey_unique"] == 3  # the three NULL rows


# ---------------------------------------------------------------------------
# rfm_segmentation two-regime scale guard (r10 verdict #2)


def _rfm_synth(spark):
    """Two segments x 8 customers, all three metrics distinct within a
    segment and n_seg % 4 == 0 — the configuration where rank quartiles
    and threshold quartiles agree EXACTLY (no boundary ties)."""
    orders, customers = [], []
    ok = 0
    for s, seg in enumerate(["AUTOMOBILE", "BUILDING"]):
        for i in range(1, 9):
            ck = s * 100 + i
            customers.append((ck, seg))
            # frequency = i orders; last date advances with i (distinct
            # recency); per-order price grows with i (distinct monetary)
            for j in range(i):
                ok += 1
                orders.append(
                    (ok, ck, f"1995-0{s + 1}-{i:02d}", float(100 * i + j + 1))
                )
    o = spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate string, o_totalprice double"
    ).withColumn("o_orderdate", F.to_timestamp("o_orderdate"))
    c = spark.createDataFrame(customers, "c_custkey long, c_mktsegment string")
    return o, c


def test_rfm_approx_regime_matches_exact_away_from_boundaries(spark):
    from flink_streaming_etl_spark.operators import analytics as an

    o, c = _rfm_synth(spark)
    exact = {r["c_custkey"]: tuple(r) for r in an.rfm_segmentation(o, c, approx=False).collect()}
    approx = {r["c_custkey"]: tuple(r) for r in an.rfm_segmentation(o, c, approx=True).collect()}
    assert exact == approx
    assert len(exact) == 16


def test_rfm_approx_plan_has_no_window_sort(spark):
    """The scale regime's plan must contain NO window operator — the
    quartile assignment is a broadcast join + map-side CASE."""
    from flink_streaming_etl_spark.operators import analytics as an
    from flink_streaming_etl_spark.plans import plan_text

    t = _tables(spark)
    plan = plan_text(an.rfm_segmentation(t["orders"], t["customer"], approx=True))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_rfm_auto_guard_selects_by_size(spark, monkeypatch):
    from flink_streaming_etl_spark.operators import analytics as an
    from flink_streaming_etl_spark.plans import plan_text

    o, c = _rfm_synth(spark)
    monkeypatch.setattr(an, "RFM_EXACT_MAX_ROWS", 0)
    big = an.rfm_segmentation(o, c)  # auto -> approx above the cap
    assert "Window" not in plan_text(big)
    monkeypatch.setattr(an, "RFM_EXACT_MAX_ROWS", 10**9)
    small = an.rfm_segmentation(o, c)  # auto -> exact under the cap
    assert "Window" in plan_text(small)
