"""Round 14 (r13 verdict): NFA scan bounds + out-of-fragment routing,
relation-side path counts, quantified-CEP timeout side output,
executor-resident state for the corpus-scale dedup accumulators, and the
transformWithState ±delta pilot."""

from __future__ import annotations

import time
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flink_streaming_etl_spark.api import load_tables
from tests.conftest import SF_SMOKE


def _tables(spark):
    return load_tables(spark, SF_SMOKE, register=False)


def _define_events(spark, vals_types, uid=1, step_minutes=60):
    t0 = datetime(2024, 3, 1, 12, 0, 0)
    rows = [
        (uid * 1000 + i, t0 + timedelta(minutes=step_minutes * i), uid, ty, v)
        for i, (v, ty) in enumerate(vals_types)
    ]
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


# ---------------------------------------------------------------------------
# Task 3: the NFA scan is memoized and boundable (r13 verdict #4)


def test_nfa_scan_memoization_survives_pathological_key():
    """One key, adversarial history: five all-true '+' steps and an
    impossible tail — the naive scan is O(n^5) per start (heat-death
    territory at n=400); the memoized scan completes in seconds."""
    from flink_streaming_etl_spark.operators.cep import _nfa_scan

    n = 400
    flags = [[True] * n for _ in range(5)] + [[False] * n]
    quants = ["+"] * 5 + ["1"]
    t0 = time.monotonic()
    out = _nfa_scan(flags, quants)
    assert out == []  # tail never matches → no match from any start
    assert time.monotonic() - t0 < 30.0


def test_nfa_scan_budget_overflow_semantics():
    """The per-key work cap: 'raise' (default) surfaces the hot key,
    'truncate' keeps the matches completed before the budget point."""
    from flink_streaming_etl_spark.operators.cep import (
        NfaScanBudgetExceeded,
        _nfa_scan,
    )

    n = 50
    # A B with B true only at even positions: many small matches
    flags = [[True] * n, [i % 2 == 0 for i in range(n)]]
    quants = ["1", "1"]
    full = _nfa_scan(flags, quants)
    assert len(full) > 3
    with pytest.raises(NfaScanBudgetExceeded):
        _nfa_scan(flags, quants, budget=10)
    part = _nfa_scan(flags, quants, budget=10, on_budget="truncate")
    # truncation keeps an exact PREFIX of the full match list
    assert part == full[: len(part)] and len(part) < len(full)


def test_nfa_within_prune_bounds_scan_and_backtracks_inside_window(spark):
    """within_mode juxtaposition on one stream: 'filter' (the oracle
    semantics) finds the greedy match, sees it over-WITHIN, and drops
    it; 'prune' (FlinkCEP window semantics) never extends past the
    horizon, so backtracking reports the shorter in-window completion."""
    from flink_streaming_etl_spark.operators.cep import (
        DefineStep,
        cep_define_matches_nfa,
    )

    # rising hourly values; purchases at index 3 and 10
    rows = [
        (float(i), "purchase" if i in (3, 10) else "view") for i in range(11)
    ]
    ev = _define_events(spark, rows)
    steps = [
        DefineStep("up", lambda c: c["value"] > c["prev_value"], "+"),
        DefineStep(
            "tail",
            lambda c: (c["event_type"] == "purchase")
            & (c["value"] > c["prev_value"]),
        ),
    ]
    filt = cep_define_matches_nfa(ev, steps, within_hours=5).collect()
    assert filt == []  # greedy binds the index-10 purchase → span 9 h → drop
    pruned = sorted(
        cep_define_matches_nfa(
            ev, steps, within_hours=5, within_mode="prune"
        ).collect(),
        key=lambda r: r["start_us"],
    )
    # first match backtracks to the index-3 purchase (horizon caps the
    # run); the freed tail then yields a second in-window match ending
    # at the index-10 purchase — matches 'filter' mode provably misses
    assert [r["tail_first_event_id"] for r in pruned] == [1003, 1010]
    assert all(r["end_us"] - r["start_us"] <= 5 * 3600 * 1000000 for r in pruned)
    # no WITHIN → the two modes coincide exactly
    a = sorted(
        tuple(r)
        for r in cep_define_matches_nfa(ev, steps, within_hours=None).collect()
    )
    b = sorted(
        tuple(r)
        for r in cep_define_matches_nfa(
            ev, steps, within_hours=None, within_mode="prune"
        ).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# Task 6: quantified-CEP dead-partial side output (mirrors the relaxed
# accumulator's r13 on_timeouts_df path)

_US = 1_000_000
_H = 3600 * _US


def _ev_batch(spark, rows):
    return spark.createDataFrame(
        rows,
        "event_id long, user_id long, us long, event_type string, value double",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def test_quantified_cep_timeout_reasons(spark):
    """One batch, three users, all three dead-partial reasons: a
    completed A B+ C past WITHIN (over_within), an interrupted run
    (broken), and — after a second batch ages it out — an expired
    pending start. Matched and still-pending starts never report."""
    from flink_streaming_etl_spark.streaming.cep import (
        QuantifiedCepAccumulator,
    )

    base = 1_700_000_000 * _US
    b0 = [
        # user 1: complete but 30 h span → over_within
        (10, 1, base, "view", 1.0),
        (11, 1, base + _H, "click", 2.0),
        (12, 1, base + 30 * _H, "purchase", 3.0),
        # user 2: A run interrupted by error → broken
        (20, 2, base, "view", 1.0),
        (21, 2, base + _H, "click", 2.0),
        (22, 2, base + 2 * _H, "error", 0.0),
        # user 3: trailing A + run → pending, must NOT report yet
        (30, 3, base, "view", 1.0),
        (31, 3, base + _H, "click", 2.0),
        # user 4: complete within bound → emitted, never reports
        (40, 4, base, "view", 1.0),
        (41, 4, base + _H, "click", 2.0),
        (42, 4, base + 2 * _H, "purchase", 3.0),
    ]
    acc = QuantifiedCepAccumulator()
    matches = acc.add_batch(_ev_batch(spark, b0), 0)
    assert [m[0] for m in matches] == [4]
    got = sorted(acc.last_timeouts)
    assert got == [
        (1, 10, base, "over_within"),
        (2, 20, base, "broken"),
    ]
    # batch 1: user 3's newest row moves 30 h past its pending A
    b1 = [(32, 3, base + 30 * _H, "error", 0.0)]
    acc.add_batch(_ev_batch(spark, b1), 1)
    assert acc.last_timeouts == [(3, 30, base, "expired")]


def test_quantified_cep_on_timeouts_df_never_collects(spark, monkeypatch):
    """With a distributed timeout sink the quantified fold performs ZERO
    driver collects and the sink receives the same rows the collect
    path reports — the r13 relaxed-CEP pin, mirrored (r13 verdict #6)."""
    from tests.test_round13 import _CollectSpy

    from flink_streaming_etl_spark.streaming.cep import (
        QuantifiedCepAccumulator,
    )

    base = 1_700_000_000 * _US
    b0 = [
        (1, 1, base, "view", 1.0),
        (2, 1, base + _H, "click", 2.0),
    ]
    b1 = [(3, 1, base + 30 * _H, "error", 0.0)]

    ref = QuantifiedCepAccumulator()
    ref.add_batch(_ev_batch(spark, b0), 0)
    assert ref.last_timeouts == []  # pending start must not pre-report
    ref.add_batch(_ev_batch(spark, b1), 1)
    want = sorted(ref.last_timeouts)
    assert want, "scenario must produce a timeout"

    sunk_dfs: list = []
    acc = QuantifiedCepAccumulator(on_timeouts_df=sunk_dfs.append)
    with _CollectSpy(monkeypatch) as spy:
        acc.add_batch(_ev_batch(spark, b0), 0, on_matches_df=lambda df: None)
        acc.add_batch(_ev_batch(spark, b1), 1, on_matches_df=lambda df: None)
    assert spy.calls == [], spy.calls
    assert acc.last_timeouts == []
    sunk = [
        (r["user_id"], r["start_event_id"], r["start_us"], r["reason"])
        for df in sunk_dfs
        for r in df.collect()
    ]
    assert sorted(sunk) == want


def test_nfa_budget_raises_end_to_end(spark):
    """The budget threads through the Spark entry point: a tiny per-key
    cap fails the job with the documented error, truncate completes."""
    from flink_streaming_etl_spark.operators.cep import (
        DefineStep,
        cep_define_matches_nfa,
    )

    ev = _define_events(spark, [(float(i % 7), "view") for i in range(60)])
    steps = [
        DefineStep("up", lambda c: c["value"] > c["prev_value"], "+"),
        DefineStep("dn", lambda c: c["value"] < c["prev_value"], "+"),
    ]
    from py4j.protocol import Py4JJavaError

    with pytest.raises(Exception) as ei:
        cep_define_matches_nfa(ev, steps, scan_budget_per_key=5).collect()
    assert "NFA scan exceeded" in str(ei.value)
    got = cep_define_matches_nfa(
        ev, steps, scan_budget_per_key=5, on_budget="truncate"
    ).collect()
    full = cep_define_matches_nfa(ev, steps).collect()
    assert len(got) <= len(full)
