"""Property-based checks of the CEP accumulators: for ANY event stream
(types, gaps — including WITHIN-crossing ones) and ANY batch-monotone
chunking, the concatenated emissions (+ flush for relaxed) must equal a
brute-force sequential NFA scan of the full stream. The generators bias
toward self-overlapping runs and horizon-crossing gaps — exactly the
cases where the pending/cut logic can go wrong."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from flink_streaming_etl_spark.operators import cep
from flink_streaming_etl_spark.streaming.cep import (
    CepAccumulator,
    RelaxedCepAccumulator,
)
from tests.test_cep import _WITHIN_US, _brute_greedy, _brute_relaxed

_US = 1_000_000
#: gaps in seconds: dense runs, hour-scale, and WITHIN-crossing
_GAPS = [600, 3600, 7200, 26 * 3600]
_TYPES = ["view", "click", "click", "purchase", "error"]

stream_st = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),  # user
        st.sampled_from(_GAPS),
        st.sampled_from(_TYPES),
    ),
    min_size=10,
    max_size=40,
)
cuts_st = st.lists(
    st.integers(min_value=1, max_value=9), min_size=1, max_size=4
)


def _build(spark, raw):
    rows, t, eid = [], {}, 0
    for uid, gap, typ in raw:
        t[uid] = t.get(uid, 1_700_000_000 * _US) + gap * _US
        rows.append((eid, uid, t[uid], typ))
        eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
    )


def _chunks(ordered, cuts):
    # map the drawn cut offsets into valid, sorted, unique boundaries
    n = len(ordered)
    bounds = sorted({1 + (c * (n - 1)) // 10 for c in cuts if n > 1})
    out, prev = [], 0
    for b in bounds + [n]:
        if b > prev:
            out.append(ordered[prev:b])
            prev = b
    return out


def _rows_us(df):
    return df.select(
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        "event_id",
        "event_type",
    ).collect()


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=stream_st, cuts=cuts_st)
def test_strict_accumulator_matches_nfa_model(spark, raw, cuts):
    df = _build(spark, raw)
    want = _brute_greedy(_rows_us(df), cep.CEP_GREEDY_STEPS, _WITHIN_US)
    acc = CepAccumulator()
    got = []
    for i, ch in enumerate(_chunks(df.orderBy("ts", "event_id").collect(), cuts)):
        got.extend(acc.add_batch(spark.createDataFrame(ch, df.schema), i))
        for pend in acc.tails.values():
            assert len(pend) <= len(cep.CEP_GREEDY_STEPS) - 1
    assert sorted(got) == want


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=stream_st, cuts=cuts_st)
def test_relaxed_accumulator_matches_nfa_model(spark, raw, cuts):
    df = _build(spark, raw)
    want = _brute_relaxed(_rows_us(df), cep.CEP_FUNNEL_STEPS, _WITHIN_US)
    acc = RelaxedCepAccumulator()
    got = []
    for i, ch in enumerate(_chunks(df.orderBy("ts", "event_id").collect(), cuts)):
        got.extend(acc.add_batch(spark.createDataFrame(ch, df.schema), i))
        for pend in acc.tails.values():
            assert pend[-1][0] - pend[0][0] <= _WITHIN_US
    got.extend(acc.flush(spark))
    assert sorted(got) == want


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(raw=stream_st, cuts=cuts_st)
def test_quantified_accumulator_matches_batch(spark, raw, cuts):
    from flink_streaming_etl_spark.streaming.cep import QuantifiedCepAccumulator

    rows, t, eid = [], {}, 0
    for uid, gap, typ in raw:
        t[uid] = t.get(uid, 1_700_000_000 * _US) + gap * _US
        rows.append((eid, uid, t[uid], typ, float((eid % 9) + 1)))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    want = sorted(
        tuple(r) for r in cep.cep_quantified_matches(df).collect()
    )
    acc = QuantifiedCepAccumulator()
    got = []
    for i, ch in enumerate(_chunks(df.orderBy("ts", "event_id").collect(), cuts)):
        got.extend(acc.add_batch(spark.createDataFrame(ch, df.schema), i))
    assert sorted(got) == want
