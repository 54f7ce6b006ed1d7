"""Delta-maintained aggregates must equal full recompute after every batch,
on the reference's cancellable-orders scenario (inserts, amount updates,
status flips in and out of the filter, deletes) and under arbitrary
chunkings (Hypothesis)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from flink_streaming_etl_spark.sources.cdc import CdcSource, latest_state
from flink_streaming_etl_spark.streaming.incremental import IncrementalSumCount

from tests.test_cdc import ORDER_SCHEMA, env, order, raw_df


def day_stats_incremental():
    return IncrementalSumCount(
        key_exprs=lambda img: [img["user_id"], F.substring(img["ctime"], 1, 10)],
        amount=lambda img: img["amount"],
        predicate=lambda img: img["status"] != "closed",
    )


def recompute(spark, src, all_lines):
    state = latest_state(src.parse(raw_df(spark, all_lines)), "id")
    return {
        (r["user_id"], r["day"]): (float(r["amount"]), r["cnt"])
        for r in state.filter(F.col("status") != "closed")
        .groupBy(F.col("user_id"), F.substring("ctime", 1, 10).alias("day"))
        .agg(
            F.sum(F.col("amount").cast("decimal(18,2)")).alias("amount"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .collect()
    }


def incr_rows(inc):
    df = inc.result()
    if df is None:
        return {}
    return {(r["k0"], r["k1"]): (float(r["amount"]), r["cnt"]) for r in df.collect()}


def test_incremental_equals_recompute_scenario(spark):
    src = CdcSource("orders", ORDER_SCHEMA, "id")
    inc = day_stats_incremental()
    batches = [
        [  # inserts
            env("c", order("o1", "u1", 100.0, "payed"), ts=1),
            env("c", order("o2", "u1", 50.0, "payed"), ts=2),
            env("c", order("o3", "u2", 30.0, "created"), ts=3),
        ],
        [  # amount update (retract old, add new)
            env("u", order("o1", "u1", 120.0, "payed"),
                before=order("o1", "u1", 100.0, "payed"), ts=4),
        ],
        [  # flip OUT of the filter (pure retraction)
            env("u", order("o2", "u1", 50.0, "closed"),
                before=order("o2", "u1", 50.0, "payed"), ts=5),
        ],
        [  # flip back IN (pure addition)
            env("u", order("o2", "u1", 50.0, "payed"),
                before=order("o2", "u1", 50.0, "closed"), ts=6),
        ],
        [  # delete + new user same batch
            env("d", before=order("o3", "u2", 30.0, "created"), ts=7),
            env("c", order("o4", "u3", 7.0, "payed"), ts=8),
        ],
    ]
    seen: list[str] = []
    for batch in batches:
        inc.apply(src.parse(raw_df(spark, batch)))
        seen += batch
        assert incr_rows(inc) == recompute(spark, src, seen)


EVENT = st.tuples(
    st.sampled_from(["c", "u", "d"]),
    st.sampled_from(["o1", "o2"]),
    st.sampled_from(["payed", "closed"]),
    st.sampled_from([10.0, 20.0, 30.0]),
)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(events=st.lists(EVENT, min_size=1, max_size=8))
def test_incremental_equals_recompute_random(spark, events):
    """Random sequences, made changelog-consistent (before-image = actual
    prior row; c only when absent, u/d only when present)."""
    src = CdcSource("orders", ORDER_SCHEMA, "id")
    inc = day_stats_incremental()
    live: dict[str, tuple] = {}
    lines = []
    ts = 0
    for op, key, status, amount in events:
        ts += 1
        if op == "c" and key not in live:
            live[key] = (key, "u1", amount, status)
            lines.append(env("c", order(*live[key]), ts=ts))
        elif op == "u" and key in live:
            before = live[key]
            live[key] = (key, "u1", amount, status)
            lines.append(env("u", order(*live[key]), before=order(*before), ts=ts))
        elif op == "d" and key in live:
            lines.append(env("d", before=order(*live.pop(key)), ts=ts))
    if not lines:
        return
    # two chunks
    mid = max(1, len(lines) // 2)
    for chunk in (lines[:mid], lines[mid:]):
        if chunk:
            inc.apply(src.parse(raw_df(spark, chunk)))
    assert incr_rows(inc) == recompute(spark, src, lines)
