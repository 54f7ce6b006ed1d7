"""Round-12 pins.

Fold-then-commit replay guards for the six pre-CEP accumulators (r11
verdict #1 — the wave-6 diagnosis applied everywhere): a batch that
fails MID-FOLD and is retried under the SAME epoch id must re-fold
(at-least-once), never be skipped as an already-seen replay. Before this
round these accumulators committed ``last_batch_id`` (and some state)
BEFORE folding, so a same-epoch retry was silently lost. Each test arms
a one-shot failure at a different point of the fold (kernel, durable
save, composed-agg merge), asserts nothing committed, retries under the
same epoch id, and pins the final answer against a never-failed run.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _flaky_once(fn, exc=RuntimeError("transient executor loss")):
    armed = {"on": True}

    def wrapper(*a, **kw):
        if armed["on"]:
            armed["on"] = False
            raise exc
        return fn(*a, **kw)

    return wrapper


# -- IncrementalTopK: failure inside the rank kernel ---------------------


def test_topk_failed_fold_retry_is_not_a_replay(spark):
    from flink_streaming_etl_spark.streaming.topk import IncrementalTopK
    from tests.test_round10 import _topk_rows, _topk_scenario

    B, batches = _topk_scenario(spark)

    def mk():
        return IncrementalTopK(
            pk="id", group_cols=["status"], order_col="amount", k=2
        )

    clean = mk()
    for i, lines in enumerate(batches):
        clean.apply(B(lines), batch_id=i)

    acc = mk()
    acc.apply(B(batches[0]), batch_id=0)
    committed = _topk_rows(acc.result())
    acc._rank = _flaky_once(acc._rank)
    with pytest.raises(RuntimeError):
        acc.apply(B(batches[1]), batch_id=1)
    # nothing committed: guard, state and result all at batch 0
    assert acc.last_batch_id == 0
    assert _topk_rows(acc.result()) == committed
    # retry under the SAME epoch id re-folds
    assert acc.apply(B(batches[1]), batch_id=1) is not None
    for i, lines in enumerate(batches[2:], start=2):
        acc.apply(B(lines), batch_id=i)
    assert _topk_rows(acc.result()) == _topk_rows(clean.result())
    assert _topk_rows(acc.result()) == _topk_rows(acc.recompute())


# -- IncrementalCollect: failure inside the listagg kernel ---------------


def test_collect_failed_fold_retry_is_not_a_replay(spark):
    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from flink_streaming_etl_spark.streaming.collect import IncrementalCollect
    from tests.test_cdc import ORDER_SCHEMA, env, order, raw_df

    src = CdcSource("orders", ORDER_SCHEMA, "id")

    def B(lines):
        return src.parse(raw_df(spark, lines))

    batches = [
        [env("c", order("o1", "u1", 10.0, "payed"), ts=1),
         env("c", order("o2", "u1", 20.0, "payed"), ts=2)],
        [env("c", order("o3", "u2", 30.0, "created"), ts=3),
         env("d", before=order("o1", "u1", 10.0, "payed"), ts=4)],
    ]

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    clean = IncrementalCollect(pk="id", group_cols=["status"], value_cols=["id"])
    for i, lines in enumerate(batches):
        clean.apply(B(lines), batch_id=i)

    acc = IncrementalCollect(pk="id", group_cols=["status"], value_cols=["id"])
    acc.apply(B(batches[0]), batch_id=0)
    committed = rows(acc.result())
    acc._aggregate = _flaky_once(acc._aggregate)
    with pytest.raises(RuntimeError):
        acc.apply(B(batches[1]), batch_id=1)
    assert acc.last_batch_id == 0
    assert rows(acc.result()) == committed
    assert acc.apply(B(batches[1]), batch_id=1) is not None
    assert rows(acc.result()) == rows(clean.result())
    assert rows(acc.result()) == rows(acc.recompute())


# -- IncrementalDistinctCount: failure in the durable save ---------------


def test_distinct_count_failed_save_retry_is_not_a_replay(spark, tmp_path):
    from flink_streaming_etl_spark.sources.cdc import CdcSource
    from flink_streaming_etl_spark.streaming.incremental import (
        IncrementalDistinctCount,
    )
    from tests.test_cdc import ORDER_SCHEMA, env, order, raw_df

    src = CdcSource("orders", ORDER_SCHEMA, "id")

    def B(lines):
        return src.parse(raw_df(spark, lines))

    batches = [
        [env("c", order("o1", "u1", 10.0, "payed"), ts=1),
         env("c", order("o2", "u2", 20.0, "payed"), ts=2)],
        [env("c", order("o3", "u3", 30.0, "payed"), ts=3),
         env("d", before=order("o1", "u1", 10.0, "payed"), ts=4)],
    ]

    def mk(root=None):
        return IncrementalDistinctCount(
            key_exprs=lambda img: [img["status"]],
            value=lambda img: img["user_id"],
            state_dir=root,
        )

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    clean = mk()
    for i, lines in enumerate(batches):
        clean.apply(B(lines), batch_id=i)

    acc = mk(str(tmp_path / "st"))
    acc.apply(B(batches[0]), batch_id=0)
    committed = rows(acc.result())
    acc._store.save = _flaky_once(acc._store.save)
    with pytest.raises(RuntimeError):
        acc.apply(B(batches[1]), batch_id=1)
    # the fold completed but the SAVE failed — still nothing commits
    assert acc.last_batch_id == 0
    assert rows(acc.result()) == committed
    assert acc.apply(B(batches[1]), batch_id=1) is not None
    assert rows(acc.result()) == rows(clean.result())
    # and the durable state from the retried save restores to the same
    fresh = mk(str(tmp_path / "st"))
    assert fresh.restore(spark)
    assert fresh.last_batch_id == 1
    assert rows(fresh.result()) == rows(clean.result())


# -- IncrementalJoin: failure in the durable save ------------------------


def test_incremental_join_failed_save_retry_is_not_a_replay(spark, tmp_path):
    from flink_streaming_etl_spark.streaming.incremental_join import (
        IncrementalJoin,
    )
    from tests.test_round9 import _join_scenario, _rows

    L, R, batches = _join_scenario(spark)

    def mk(root=None):
        return IncrementalJoin(
            left_pk="id", right_pk="id", left_key="user_id", right_key="id",
            state_dir=root,
        )

    clean = mk()
    for i, (ll, rr) in enumerate(batches):
        clean.apply(L(ll), R(rr), batch_id=i)

    acc = mk(str(tmp_path / "st"))
    acc.apply(L(batches[0][0]), R(batches[0][1]), batch_id=0)
    acc._store.save = _flaky_once(acc._store.save)
    with pytest.raises(RuntimeError):
        acc.apply(L(batches[1][0]), R(batches[1][1]), batch_id=1)
    assert acc.last_batch_id == 0
    # retry under the same epoch id re-folds; rest of the changelog lands
    assert acc.apply(L(batches[1][0]), R(batches[1][1]), batch_id=1) is not None
    for i, (ll, rr) in enumerate(batches[2:], start=2):
        acc.apply(L(ll), R(rr), batch_id=i)
    assert _rows(acc.result()) == _rows(clean.result())
    assert _rows(acc.result()) == _rows(acc.recompute())


# -- IncrementalJoinAgg: failure in the AGG fold AFTER the join fold -----


def test_join_agg_failure_after_join_fold_retries_whole_batch(spark, tmp_path):
    """The exact crash window of r11 verdict #1: the join half of the
    composition succeeds, the aggregate half fails — before this round
    the join had already committed its replay guard, so the same-epoch
    retry skipped the batch and the aggregate undercounted forever."""
    from flink_streaming_etl_spark.streaming.incremental_join import (
        IncrementalJoin,
        IncrementalJoinAgg,
    )
    from tests.test_round9 import _join_scenario, _rows

    L, R, batches = _join_scenario(spark)

    def mk(root=None):
        join = IncrementalJoin(
            left_pk="id", right_pk="id", left_key="user_id", right_key="id",
        )
        agg = IncrementalJoinAgg(
            join,
            group_cols={"user_id": "user_id",
                        "cday": F.substring("ctime", 1, 10)},
            amount=F.col("amount"),
            predicate=F.col("status") != "closed",
            state_dir=root,
        )
        return join, agg

    _, clean = mk()
    for i, (ll, rr) in enumerate(batches):
        clean.apply(L(ll), R(rr), batch_id=i)

    join, agg = mk(str(tmp_path / "st"))
    agg.apply(L(batches[0][0]), R(batches[0][1]), batch_id=0)
    agg.apply(L(batches[1][0]), R(batches[1][1]), batch_id=1)
    agg._signed_group_deltas = _flaky_once(agg._signed_group_deltas)
    with pytest.raises(RuntimeError):
        agg.apply(L(batches[2][0]), R(batches[2][1]), batch_id=2)
    # the join fold succeeded, but NOTHING committed — join guard and
    # join state are still at batch 1
    assert join.last_batch_id == 1
    assert _rows(join.result()) == _rows(join.recompute())
    # same-epoch retry folds the batch through BOTH layers exactly once
    agg.apply(L(batches[2][0]), R(batches[2][1]), batch_id=2)
    for i, (ll, rr) in enumerate(batches[3:], start=3):
        agg.apply(L(ll), R(rr), batch_id=i)
    assert _rows(agg.result()) == _rows(clean.result())
    assert _rows(agg.result()) == _rows(agg.recompute())
    # the composed durable state restores to the committed answer
    join2, agg2 = mk(str(tmp_path / "st"))
    assert agg2.restore(spark)
    assert _rows(agg2.result()) == _rows(clean.result())


# -- DataQualityAccumulator: failure in the durable save -----------------


def test_data_quality_failed_save_retry_is_not_a_replay(spark, tmp_path):
    from flink_streaming_etl_spark.streaming.data_quality import (
        DataQualityAccumulator,
    )
    from tests.test_round10 import _tables

    t = _tables(spark)
    orders, customer = t["orders"], t["customer"]
    dim = {r["c_custkey"] for r in customer.select("c_custkey").collect()}

    rows = orders.orderBy("o_orderkey").collect()
    n = len(rows)
    batches = [rows[: n // 2], rows[n // 2 :] + [rows[0]]]  # cross-batch dup

    clean = DataQualityAccumulator(dim_keys=dim)
    for i, rs in enumerate(batches):
        clean.add_batch(spark.createDataFrame(rs, orders.schema), batch_id=i)
    want = sorted(tuple(r) for r in clean.result(spark).collect())

    acc = DataQualityAccumulator(dim_keys=dim, state_dir=str(tmp_path / "st"))
    acc.add_batch(spark.createDataFrame(batches[0], orders.schema), batch_id=0)
    n_rows_before = acc.n_rows
    acc._store.save = _flaky_once(acc._store.save)
    with pytest.raises(RuntimeError):
        acc.add_batch(spark.createDataFrame(batches[1], orders.schema), batch_id=1)
    # counters, seen relation and guard all still at batch 0
    assert acc.last_batch_id == 0
    assert acc.n_rows == n_rows_before
    acc.add_batch(spark.createDataFrame(batches[1], orders.schema), batch_id=1)
    got = sorted(tuple(r) for r in acc.result(spark).collect())
    assert got == want
    assert acc.violations["orderkey_unique"] == 1  # folded exactly once


# -- EventPathAccumulator: failure at the end of the driver fold ---------


def test_event_path_failed_fold_retry_is_not_a_replay(spark):
    from flink_streaming_etl_spark.operators import analytics as an
    from flink_streaming_etl_spark.streaming.paths import EventPathAccumulator
    from tests.test_round10 import _tables

    ev = _tables(spark)["events"]
    want = sorted(
        (r["path"], r["n_sessions"])
        for r in an.top_event_paths(ev, top_n=10**9).collect()
    )

    ordered = ev.orderBy("ts", "event_id").collect()
    n = len(ordered)
    cuts = [ordered[: n // 2], ordered[n // 2 :]]
    acc = EventPathAccumulator()
    acc.add_batch(spark.createDataFrame(cuts[0], ev.schema), batch_id=0)
    open_before = dict(acc.open)
    counts_before = dict(acc.counts)
    # fail at the LAST step of the fold — everything already computed,
    # nothing may commit
    acc._evict = _flaky_once(acc._evict)
    with pytest.raises(RuntimeError):
        acc.add_batch(spark.createDataFrame(cuts[1], ev.schema), batch_id=1)
    assert acc.last_batch_id == 0 and acc.n_batches == 1
    assert dict(acc.open) == open_before and dict(acc.counts) == counts_before
    # same-epoch retry folds exactly once
    acc.add_batch(spark.createDataFrame(cuts[1], ev.schema), batch_id=1)
    got = sorted(tuple(r) for r in acc.result(spark).collect())
    assert got == want
