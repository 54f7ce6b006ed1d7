"""CEP / MATCH_RECOGNIZE battery — batch semantics vs a brute-force
greedy model, oracle parity (also re-checked by test_oracle_parity), the
streaming accumulator's chunking-invariance pin, replay idempotence,
restart round-trip, and the plan shape of the candidate pass."""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from flink_streaming_etl_spark.operators import cep
from flink_streaming_etl_spark.streaming.cep import CepAccumulator
from tests.conftest import SF_SMOKE

_US = 1_000_000
_WITHIN_US = cep.CEP_WITHIN_HOURS * 3600 * _US


def _events(spark, sf_dir=SF_SMOKE):
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _brute_greedy(rows, steps, within_us):
    """Reference model: per-key left-to-right scan (the NFA semantics)."""
    from collections import defaultdict

    by = defaultdict(list)
    for r in rows:
        by[r["user_id"]].append((r["us"], r["event_id"], r["event_type"]))
    L = len(steps)
    out = []
    for uid, evl in sorted(by.items()):
        evl.sort()
        i = 0
        while i + L - 1 < len(evl):
            ok = all(evl[i + j][2] == steps[j] for j in range(L)) and (
                evl[i + L - 1][0] - evl[i][0] <= within_us
            )
            if ok:
                out.append(
                    (uid, evl[i][1], evl[i + L - 1][1], evl[i][0], evl[i + L - 1][0])
                )
                i += L
            else:
                i += 1
    return sorted(out)


def _rows_with_us(events):
    return (
        events.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            "event_type",
        )
        .collect()
    )


def test_greedy_equals_bruteforce(spark):
    ev = _events(spark)
    got = sorted(tuple(r) for r in cep.cep_greedy_matches(ev).collect())
    want = _brute_greedy(_rows_with_us(ev), cep.CEP_GREEDY_STEPS, _WITHIN_US)
    assert got == want
    # non-overlap: every event id consumed at most once
    used = [x for m in got for x in (m[1], m[2])]
    assert len(used) == len(set(used))


def test_all_matches_superset_of_greedy(spark):
    ev = _events(spark)
    allm = {
        tuple(r)
        for r in cep.cep_pattern_matches(
            ev, cep.CEP_GREEDY_STEPS, cep.CEP_WITHIN_HOURS
        ).collect()
    }
    greedy = {tuple(r) for r in cep.cep_greedy_matches(ev).collect()}
    assert greedy <= allm


def test_timeout_report_reasons(spark):
    base = datetime(2024, 1, 1)
    rows = [
        # complete funnel — not in the report
        (1, base, 10, "view"),
        (1, base + timedelta(hours=1), 11, "click"),
        (1, base + timedelta(hours=2), 12, "purchase"),
        # wrong next: view, click, then error
        (1, base + timedelta(days=2), 13, "view"),
        (1, base + timedelta(days=2, hours=1), 14, "click"),
        (1, base + timedelta(days=2, hours=2), 15, "error"),
        # late: purchase arrives past the 24 h bound
        (2, base, 20, "view"),
        (2, base + timedelta(hours=1), 21, "click"),
        (2, base + timedelta(hours=30), 22, "purchase"),
        # end of stream: prefix with nothing after
        (3, base, 30, "view"),
        (3, base + timedelta(hours=1), 31, "click"),
    ]
    ev = spark.createDataFrame(
        [(eid, ts, uid, t, 0.0, None) for uid, ts, eid, t in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    got = {
        (r["user_id"], r["start_event_id"], r["reason"])
        for r in cep.cep_timeout_report(ev).collect()
    }
    assert got == {(1, 13, "wrong_next"), (2, 20, "late"), (3, 30, "end_of_stream")}


def test_candidate_pass_plan_shape(spark):
    """The SKIP TO NEXT ROW matcher is pure window algebra: no Python
    eval anywhere, and a single exchange (the per-key hash partition)."""
    plan = cep.cep_pattern_matches(_events(spark))._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert plan.count("Exchange") == 1


def _synth_stream(spark, seed: int, n_users: int = 3, n_per_user: int = 60):
    """Click-heavy synthetic stream — long click runs stress the greedy
    overlap resolution; occasional >24 h gaps stress the WITHIN bound."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for uid in range(n_users):
        t = 1_700_000_000 * _US
        for _ in range(n_per_user):
            t += rng.choice([60, 3600, 90_000, 30 * 3600]) * _US
            rows.append(
                (eid, t, uid, rng.choice(["click", "click", "click", "view", "purchase"]))
            )
            eid += 1
    df = spark.createDataFrame(
        [(e, u, t, ty) for (e, t, u, ty) in rows],
        "event_id long, user_id long, us long, event_type string",
    ).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"), "user_id", "event_type"
    )
    return df, rows


@pytest.mark.parametrize("seed,n_chunks", [(1, 4), (2, 7), (3, 3)])
def test_accumulator_chunking_invariance(spark, seed, n_chunks):
    """Over any batch-monotone chunking, concatenated add_batch emissions
    equal the batch operator on the full table — including the WITHIN
    aging of pending tails."""
    df, rows = _synth_stream(spark, seed)
    want = sorted(tuple(r) for r in cep.cep_greedy_matches(df).collect())

    ordered = df.orderBy("ts", "event_id").collect()
    rng = random.Random(seed + 100)
    cuts = sorted(rng.sample(range(1, len(ordered)), n_chunks - 1))
    chunks, prev = [], 0
    for c in cuts + [len(ordered)]:
        chunks.append(ordered[prev:c])
        prev = c

    acc = CepAccumulator()
    got = []
    for i, chunk in enumerate(chunks):
        batch = spark.createDataFrame(chunk, df.schema)
        got.extend(acc.add_batch(batch, batch_id=i))
    assert sorted(got) == want
    # bounded state: ≤ L-1 pending rows per key
    assert all(len(v) <= len(cep.CEP_GREEDY_STEPS) - 1 for v in acc.tails.values())


def test_accumulator_replay_is_noop(spark):
    df, _ = _synth_stream(spark, 7, n_users=2, n_per_user=20)
    acc = CepAccumulator()
    first = acc.add_batch(df, batch_id=0)
    assert acc.add_batch(df, batch_id=0) == []
    assert sorted(first) == sorted(
        tuple(r) for r in cep.cep_greedy_matches(df).collect()
    )


def test_accumulator_restart_roundtrip(spark, tmp_path):
    """Durable state: a new accumulator restored from the store resumes
    mid-stream and the combined emissions equal the batch operator."""
    df, _ = _synth_stream(spark, 11, n_users=2, n_per_user=40)
    want = sorted(tuple(r) for r in cep.cep_greedy_matches(df).collect())
    ordered = df.orderBy("ts", "event_id").collect()
    third = len(ordered) // 3
    batches = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]

    root = str(tmp_path / "cep_state")
    acc = CepAccumulator(store_root=root)
    got = []
    got.extend(acc.add_batch(spark.createDataFrame(batches[0], df.schema), 0))
    got.extend(acc.add_batch(spark.createDataFrame(batches[1], df.schema), 1))
    # crash + restart: fresh accumulator, state restored from the store
    acc2 = CepAccumulator(store_root=root, spark=spark)
    assert acc2.last_batch_id == 1
    assert acc2.tails == acc.tails
    # at-least-once replay of batch 1 is a no-op
    assert acc2.add_batch(spark.createDataFrame(batches[1], df.schema), 1) == []
    got.extend(acc2.add_batch(spark.createDataFrame(batches[2], df.schema), 2))
    assert sorted(got) == want


def _brute_relaxed(rows, steps, within_us):
    """Reference model for relaxed contiguity (followedBy) with SKIP
    PAST LAST ROW: earliest valid start, each step binds to the first
    row of its type after the previous binding."""
    from collections import defaultdict

    by = defaultdict(list)
    for r in rows:
        by[r["user_id"]].append((r["us"], r["event_id"], r["event_type"]))
    L = len(steps)
    out = []
    for uid, evl in sorted(by.items()):
        evl.sort()
        pos = 0
        while pos < len(evl):
            emitted = False
            for p in range(pos, len(evl)):
                if evl[p][2] != steps[0]:
                    continue
                cur, ok = p, True
                for j in range(1, L):
                    nxt = next(
                        (i for i in range(cur + 1, len(evl)) if evl[i][2] == steps[j]),
                        None,
                    )
                    if nxt is None:
                        ok = False
                        break
                    cur = nxt
                if ok and evl[cur][0] - evl[p][0] <= within_us:
                    out.append(
                        (uid, evl[p][1], evl[cur][1], evl[p][0], evl[cur][0])
                    )
                    pos = cur + 1
                    emitted = True
                    break
            if not emitted:
                break
    return sorted(out)


def test_relaxed_equals_bruteforce(spark):
    ev = _events(spark)
    got = sorted(tuple(r) for r in cep.cep_relaxed_matches(ev).collect())
    want = _brute_relaxed(_rows_with_us(ev), cep.CEP_FUNNEL_STEPS, _WITHIN_US)
    assert got == want


def test_relaxed_bruteforce_on_synthetic(spark):
    """Click-heavy streams stress overlapping relaxed bindings and the
    WITHIN pruning of otherwise-valid chains."""
    for seed in (21, 22):
        df, _ = _synth_stream(spark, seed, n_users=2, n_per_user=50)
        got = sorted(tuple(r) for r in cep.cep_relaxed_matches(df).collect())
        rows = _rows_with_us(df)
        want = _brute_relaxed(rows, cep.CEP_FUNNEL_STEPS, _WITHIN_US)
        assert got == want


def test_relaxed_superset_of_contiguous_greedy_counts(spark):
    """Relaxed matching can only find matches where contiguous matching
    found none or more-constrained ones; on the funnel pattern the
    relaxed match count dominates the strict-contiguity count."""
    ev = _events(spark)
    strict = cep.cep_greedy_matches(ev, cep.CEP_FUNNEL_STEPS, cep.CEP_WITHIN_HOURS).count()
    relaxed = cep.cep_relaxed_matches(ev).count()
    assert relaxed >= strict


def _funnel_stream(spark, seed: int, n_users: int = 3, n_per_user: int = 60):
    """Funnel-heavy stream for the relaxed accumulator: short gaps keep
    chains inside WITHIN; the occasional 26 h gap expires some."""
    rng = random.Random(seed)
    rows = []
    eid = 0
    for uid in range(n_users):
        t = 1_700_000_000 * _US
        for _ in range(n_per_user):
            t += rng.choice([600, 3600, 7200, 26 * 3600]) * _US
            rows.append(
                (
                    eid,
                    uid,
                    t,
                    rng.choice(
                        ["view", "click", "purchase", "view", "click", "error"]
                    ),
                )
            )
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"), "user_id", "event_type"
    )


@pytest.mark.parametrize("seed,n_chunks", [(5, 5), (6, 8), (9, 6)])
def test_relaxed_accumulator_chunking_invariance(spark, seed, n_chunks):
    """Emissions + flush over any batch-monotone chunking equal the
    batch relaxed matcher; carried state stays inside the per-key
    WITHIN horizon."""
    from flink_streaming_etl_spark.streaming.cep import RelaxedCepAccumulator

    df = _funnel_stream(spark, seed)
    want = sorted(tuple(r) for r in cep.cep_relaxed_matches(df).collect())
    ordered = df.orderBy("ts", "event_id").collect()
    rng = random.Random(seed + 50)
    cuts = sorted(rng.sample(range(1, len(ordered)), n_chunks - 1))
    chunks, prev = [], 0
    for c in cuts + [len(ordered)]:
        chunks.append(ordered[prev:c])
        prev = c

    acc = RelaxedCepAccumulator()
    got = []
    for i, ch in enumerate(chunks):
        got.extend(acc.add_batch(spark.createDataFrame(ch, df.schema), i))
        # within-horizon state bound: every carried row is within WITHIN
        # of its key's newest carried row
        for pend in acc.tails.values():
            assert pend[-1][0] - pend[0][0] <= _WITHIN_US
    got.extend(acc.flush(spark))
    assert sorted(got) == want
    assert acc.pending_count() == 0  # flush clears state


def test_relaxed_accumulator_replay_and_restart(spark, tmp_path):
    from flink_streaming_etl_spark.streaming.cep import RelaxedCepAccumulator

    df = _funnel_stream(spark, 12, n_users=2, n_per_user=40)
    want = sorted(tuple(r) for r in cep.cep_relaxed_matches(df).collect())
    ordered = df.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    root = str(tmp_path / "relaxed_state")

    acc = RelaxedCepAccumulator(store_root=root)
    got = list(acc.add_batch(spark.createDataFrame(ordered[:half], df.schema), 0))
    # restart from the durable store
    acc2 = RelaxedCepAccumulator(store_root=root, spark=spark)
    assert acc2.last_batch_id == 0
    assert acc2.tails == acc.tails
    # at-least-once replay is a no-op
    assert acc2.add_batch(spark.createDataFrame(ordered[:half], df.schema), 0) == []
    got.extend(acc2.add_batch(spark.createDataFrame(ordered[half:], df.schema), 1))
    got.extend(acc2.flush(spark))
    assert sorted(got) == want


def test_relaxed_pending_start_consumed_inside_span(spark):
    """A pending start strictly inside an emitted match's span is
    consumed (the scan never revisits it) — the as-of nxt jumps past
    it, and the carried state drops it."""
    from flink_streaming_etl_spark.streaming.cep import RelaxedCepAccumulator

    base = 1_700_000_000 * _US
    h = 3600 * _US
    rows = [
        (1, 1, base + 0 * h, "view"),       # match start
        (2, 1, base + 1 * h, "click"),
        (3, 1, base + 2 * h, "view"),       # pending start inside the span
        (4, 1, base + 3 * h, "purchase"),   # completes the first view
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"), "user_id", "event_type"
    )
    acc = RelaxedCepAccumulator()
    got = acc.add_batch(df, 0)
    assert [(m[1], m[2]) for m in got] == [(1, 4)]
    # view@2h sits inside the emitted span -> consumed, no carried state
    assert acc.pending_count() == 0


def test_quantified_matches_semantics(spark):
    """PATTERN (view click+ purchase) with MEASURES: hand-built stream
    exercising multi-row loops, a broken run, and the WITHIN bound."""
    base = 1_700_000_000 * _US
    h = 3600 * _US
    rows = [
        # 3-click loop, inside WITHIN
        (1, 1, base + 0 * h, "view", 1.0),
        (2, 1, base + 1 * h, "click", 2.0),
        (3, 1, base + 2 * h, "click", 3.0),
        (4, 1, base + 3 * h, "click", 4.0),
        (5, 1, base + 4 * h, "purchase", 0.0),
        # run broken by an error row — no match
        (6, 1, base + 10 * h, "view", 0.0),
        (7, 1, base + 11 * h, "click", 1.0),
        (8, 1, base + 12 * h, "error", 0.0),
        (9, 1, base + 13 * h, "purchase", 0.0),
        # valid shape but spans 26 h — killed by WITHIN
        (10, 2, base + 0 * h, "view", 0.0),
        (11, 2, base + 1 * h, "click", 1.0),
        (12, 2, base + 26 * h, "purchase", 0.0),
        # single-click loop (B+ lower bound)
        (13, 2, base + 30 * h, "view", 0.0),
        (14, 2, base + 31 * h, "click", 5.0),
        (15, 2, base + 32 * h, "purchase", 0.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    got = {
        (r["user_id"], r["start_event_id"], r["end_event_id"], r["n_loop"], r["loop_value_sum"])
        for r in cep.cep_quantified_matches(df).collect()
    }
    assert got == {(1, 1, 5, 3, 9.0), (2, 13, 15, 1, 5.0)}


def test_quantified_plan_no_python_no_iteration(spark):
    """Quantifier matching is run-length algebra: no Python eval and no
    driver-side loop — a single executed plan."""
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    plan = cep.cep_quantified_matches(ev)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


def test_vshape_semantics(spark):
    """Hand-built value series: one multi-step V, a shared peak that
    starts the next V (SKIP TO LAST UP), and a flat step breaking a
    run."""
    base = 1_700_000_000 * _US
    h = 3600 * _US
    # user 1 values: 10, 8, 5, 7, 9, 6, 6, 4, 8
    #   V1: 10->8->5 (down x2) then 5->7->9 (up x2); peak 9 starts
    #   the next descent 9->6, but 6->6 is flat and BREAKS the down
    #   run before 6->4; 4->8 rises: V2 = 6,4,8 (start at the second 6)
    vals = [10.0, 8.0, 5.0, 7.0, 9.0, 6.0, 6.0, 4.0, 8.0]
    rows = [
        (i + 1, 1, base + i * h, "view", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )
    got = sorted(
        (
            r["start_event_id"],
            r["bottom_event_id"],
            r["end_event_id"],
            r["n_down"],
            r["n_up"],
        )
        for r in cep.cep_vshape_matches(df).collect()
    )
    assert got == [(1, 3, 5, 2, 2), (7, 8, 9, 1, 1)]


def test_cep_null_key_and_null_type_rows(spark):
    """NULL user_id is a real partition (the r10/r11 null-group
    discipline) and NULL event_type rows are inert filler: they match
    no step, break strict-contiguity runs, and are skipped by relaxed
    bindings."""
    base = 1_700_000_000 * _US
    h = 3600 * _US
    rows = [
        # null-key user: a clean click,click pair
        (1, None, base + 0 * h, "click"),
        (2, None, base + 1 * h, "click"),
        # user 5: click, NULL-type row, click — contiguity broken
        (3, 5, base + 0 * h, "click"),
        (4, 5, base + 1 * h, None),
        (5, 5, base + 2 * h, "click"),
        # user 6: relaxed funnel with a NULL-type row inside — skipped
        (6, 6, base + 0 * h, "view"),
        (7, 6, base + 1 * h, None),
        (8, 6, base + 2 * h, "click"),
        (9, 6, base + 3 * h, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string"
    ).select(
        "event_id", F.timestamp_micros(F.col("us")).alias("ts"), "user_id", "event_type"
    )
    greedy = [
        (r["user_id"], r["start_event_id"], r["end_event_id"])
        for r in cep.cep_greedy_matches(df).collect()
    ]
    assert greedy == [(None, 1, 2)]  # null key matched; user 5 broken run
    relaxed = [
        (r["user_id"], r["start_event_id"], r["end_event_id"])
        for r in cep.cep_relaxed_matches(df).collect()
    ]
    assert relaxed == [(6, 6, 9)]  # null-type row skipped, chain intact

    # accumulator: null-key state round-trips across batches
    acc = CepAccumulator()
    ordered = df.orderBy("ts", "event_id").collect()
    got = []
    for i in range(0, len(ordered), 3):
        got.extend(
            acc.add_batch(spark.createDataFrame(ordered[i : i + 3], df.schema), i)
        )
    assert [(m[0], m[1], m[2]) for m in sorted(got, key=lambda m: (m[3]))] == [
        (None, 1, 2)
    ]


def _value_stream(spark, seed: int, n_users: int = 2, n_per_user: int = 50):
    rng = random.Random(seed)
    rows, eid = [], 0
    for uid in range(n_users):
        t = 1_700_000_000 * _US
        for _ in range(n_per_user):
            t += rng.choice([600, 3600, 7200, 26 * 3600]) * _US
            rows.append(
                (
                    eid,
                    uid,
                    t,
                    rng.choice(["view", "click", "click", "purchase", "error"]),
                    float(rng.randint(1, 9)),
                )
            )
            eid += 1
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


@pytest.mark.parametrize("seed,n_chunks", [(31, 5), (32, 7), (33, 3)])
def test_quantified_accumulator_chunking_invariance(spark, seed, n_chunks):
    """Streaming A B+ C: emissions over any batch-monotone chunking
    equal the batch operator — including loop runs that straddle batch
    boundaries and the WITHIN aging of the pending A."""
    from flink_streaming_etl_spark.streaming.cep import QuantifiedCepAccumulator

    df = _value_stream(spark, seed)
    want = sorted(tuple(r) for r in cep.cep_quantified_matches(df).collect())
    ordered = df.orderBy("ts", "event_id").collect()
    rng = random.Random(seed + 70)
    cuts = sorted(rng.sample(range(1, len(ordered)), n_chunks - 1))
    chunks, prev = [], 0
    for c in cuts + [len(ordered)]:
        chunks.append(ordered[prev:c])
        prev = c
    acc = QuantifiedCepAccumulator()
    got = []
    for i, ch in enumerate(chunks):
        got.extend(acc.add_batch(spark.createDataFrame(ch, df.schema), i))
        for pend in acc.tails.values():
            assert pend[-1][0] - pend[0][0] <= _WITHIN_US
    assert sorted(got) == want


def test_quantified_accumulator_run_straddles_batches(spark):
    """A loop run split across three batches still folds into ONE match
    with the full MEASURES."""
    from flink_streaming_etl_spark.streaming.cep import QuantifiedCepAccumulator

    base = 1_700_000_000 * _US
    h = 3600 * _US
    rows = [
        (1, 1, base + 0 * h, "view", 0.0),
        (2, 1, base + 1 * h, "click", 1.0),
        (3, 1, base + 2 * h, "click", 2.0),
        (4, 1, base + 3 * h, "click", 4.0),
        (5, 1, base + 4 * h, "purchase", 0.0),
    ]
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
    ordered = df.orderBy("ts", "event_id").collect()
    acc = QuantifiedCepAccumulator()
    got = []
    for i, ch in enumerate([ordered[:2], ordered[2:4], ordered[4:]]):
        got.extend(acc.add_batch(spark.createDataFrame(ch, df.schema), i))
    assert [(m[1], m[2], m[3], m[4]) for m in got] == [(1, 5, 3, 7.0)]
    assert acc.pending_count() == 0


def test_alternation_supersets_both_literals(spark):
    """PATTERN (A (B|C) D) matches exactly the union of the two literal
    patterns (alternation on one step, distinct surrounding types)."""
    ev = _events(spark)
    alt = {
        tuple(r)
        for r in cep.cep_pattern_matches(
            ev, ("view", ("click", "signup"), "purchase")
        ).collect()
    }
    b = {
        tuple(r)
        for r in cep.cep_pattern_matches(
            ev, ("view", "click", "purchase")
        ).collect()
    }
    c = {
        tuple(r)
        for r in cep.cep_pattern_matches(
            ev, ("view", "signup", "purchase")
        ).collect()
    }
    assert alt == b | c and b and c


def test_within_boundary_row_survives_tail_aging(spark):
    """A pending row EXACTLY within_us old must stay in state: it can
    still head a match of span exactly within_us (the candidate filter
    is <=). Regression for the > vs >= aging off-by-one."""
    base = 1_700_000_000 * _US
    steps = ("click", "click", "purchase")
    # batch 1 leaves TWO pending tail rows whose older one is exactly
    # within_us behind the key's newest row; batch 2 completes the
    # span-exactly-within match (ts tie, higher event_id sorts after)
    rows1 = [(1, 1, base, "click"), (2, 1, base + _WITHIN_US, "click")]
    rows2 = [(3, 1, base + _WITHIN_US, "purchase")]

    def df(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, us long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "user_id",
            "event_type",
        )

    full = df(rows1 + rows2)
    want = sorted(
        tuple(r) for r in cep.cep_greedy_matches(full, steps).collect()
    )
    acc = CepAccumulator(steps=steps)
    got = list(acc.add_batch(df(rows1), 0))
    got.extend(acc.add_batch(df(rows2), 1))
    assert sorted(got) == want and len(want) == 1


def test_quantified_within_boundary_pending_a_survives(spark):
    """An A exactly within_us old is still closable by a C arriving at
    the key's newest timestamp. Regression for the pending-A aging."""
    from flink_streaming_etl_spark.streaming.cep import QuantifiedCepAccumulator

    base = 1_700_000_000 * _US

    def df(rows):
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

    rows1 = [(1, 1, base, "view", 0.0), (2, 1, base + _WITHIN_US, "click", 3.0)]
    rows2 = [(3, 1, base + _WITHIN_US, "purchase", 0.0)]
    full = df(rows1 + rows2)
    want = sorted(tuple(r) for r in cep.cep_quantified_matches(full).collect())
    acc = QuantifiedCepAccumulator()
    got = list(acc.add_batch(df(rows1), 0))
    got.extend(acc.add_batch(df(rows2), 1))
    assert sorted(got) == want and len(want) == 1


def test_failed_fold_retry_is_not_a_replay(spark):
    """A batch that fails mid-fold and is retried under the SAME epoch
    id must re-fold (at-least-once), not be skipped as a replay — the
    batch id commits only after fold+save succeed."""
    df, _ = _synth_stream(spark, 41, n_users=2, n_per_user=20)
    want = sorted(tuple(r) for r in cep.cep_greedy_matches(df).collect())
    acc = CepAccumulator()
    boom = {"armed": True}
    orig = acc._kernel

    def flaky(batch):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("transient executor loss")
        return orig(batch)

    acc._kernel = flaky
    with pytest.raises(RuntimeError):
        acc.add_batch(df, 0)
    assert acc.last_batch_id is None and acc.tails == {}
    # retry under the same epoch id succeeds and emits everything
    assert sorted(acc.add_batch(df, 0)) == want


def test_quantified_pre_equals_loop_no_duplicate_tail_rows(spark):
    """With pre == loop both carry-over cases fire for the same key;
    the tail must still hold each row ONCE."""
    base = 1_700_000_000 * _US
    h = 3600 * _US
    rows = [
        (1, 1, base + 0 * h, "click", 1.0),
        (2, 1, base + 1 * h, "click", 2.0),
        (3, 1, base + 2 * h, "click", 3.0),
    ]
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
    _m, tails = cep.cep_quantified_with_tails(df, "click", "click", "purchase")
    got = [r["event_id"] for r in tails.collect()]
    assert len(got) == len(set(got))


def test_relaxed_timeout_side_output_exactly_once(spark):
    """A pending start that expires reports on the timeout side output
    exactly once — in the batch where it leaves the carried state."""
    from flink_streaming_etl_spark.streaming.cep import RelaxedCepAccumulator

    base = 1_700_000_000 * _US
    h = 3600 * _US

    def df(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, us long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "user_id",
            "event_type",
        )

    acc = RelaxedCepAccumulator()
    # batch 0: a view with no completion — pending
    acc.add_batch(df([(1, 1, base, "view"), (2, 1, base + h, "click")]), 0)
    assert acc.last_timeouts == []
    assert acc.pending_count() > 0
    # batch 1: 30 h later — the start expired, reported once, state clear
    acc.add_batch(df([(3, 1, base + 30 * h, "error")]), 1)
    assert [(t[0], t[1], t[3]) for t in acc.last_timeouts] == [(1, 1, "expired")]
    # batch 2: nothing new about the old start — no re-report
    acc.add_batch(df([(4, 1, base + 31 * h, "error")]), 2)
    assert acc.last_timeouts == []


def test_attach_end_to_end_file_stream(spark, tmp_path):
    """Drive CepAccumulator.attach through a REAL Structured Streaming
    file-replay source (maxFilesPerTrigger=1 → one micro-batch per
    file); collected emissions equal the batch operator."""
    import json as _json
    import os

    df, _ = _synth_stream(spark, 55, n_users=2, n_per_user=30)
    want = sorted(tuple(r) for r in cep.cep_greedy_matches(df).collect())
    ordered = df.orderBy("ts", "event_id").collect()
    src = tmp_path / "cep_src"
    src.mkdir()
    third = len(ordered) // 3
    chunks = [ordered[:third], ordered[third : 2 * third], ordered[2 * third :]]
    for i, ch in enumerate(chunks):
        path = src / f"{i:03d}.json"
        with open(path, "w") as f:
            for r in ch:
                f.write(
                    _json.dumps(
                        {
                            "event_id": r["event_id"],
                            "ts": r["ts"].strftime("%Y-%m-%d %H:%M:%S.%f"),
                            "user_id": r["user_id"],
                            "event_type": r["event_type"],
                        }
                    )
                    + "\n"
                )
        os.utime(path, (1_000_000 + i, 1_000_000 + i))  # stable file order

    stream = (
        spark.readStream.schema(
            "event_id long, ts string, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS"))
    )
    acc = CepAccumulator()
    got = []
    q = acc.attach(
        stream,
        on_matches=got.extend,
        checkpointLocation=str(tmp_path / "cep_ckpt"),
    )
    q.processAllAvailable()
    q.stop()
    assert sorted(got) == want


def test_sink_failure_before_commit_redelivers(spark):
    """on_matches runs BEFORE the durable commit: a sink failure fails
    the batch pre-commit, and the retry under the same epoch id
    re-folds and re-delivers (at-least-once, never silent loss)."""
    df, _ = _synth_stream(spark, 61, n_users=2, n_per_user=20)
    want = sorted(tuple(r) for r in cep.cep_greedy_matches(df).collect())
    acc = CepAccumulator()
    sunk, boom = [], {"armed": True}

    def sink(ms):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("sink outage")
        sunk.extend(ms)

    with pytest.raises(RuntimeError):
        acc.add_batch(df, 0, on_matches=sink)
    assert acc.last_batch_id is None and sunk == []
    acc.add_batch(df, 0, on_matches=sink)
    assert sorted(sunk) == want


def test_replay_clears_stale_timeout_side_output(spark):
    """A replayed batch must not leave the previous fold's timeouts
    visible as its own."""
    from flink_streaming_etl_spark.streaming.cep import RelaxedCepAccumulator

    base = 1_700_000_000 * _US
    h = 3600 * _US

    def df(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, us long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "user_id",
            "event_type",
        )

    acc = RelaxedCepAccumulator()
    acc.add_batch(df([(1, 1, base, "view")]), 0)
    acc.add_batch(df([(2, 1, base + 30 * h, "error")]), 1)
    assert len(acc.last_timeouts) == 1
    acc.add_batch(df([(2, 1, base + 30 * h, "error")]), 1)  # replay
    assert acc.last_timeouts == []


def test_flush_reports_end_of_stream_timeouts(spark, tmp_path):
    """flush() lands unresolved pending starts on the timeout side
    output with reason end_of_stream, and durably saves the cleared
    state so a post-flush restart does not resurrect it."""
    from flink_streaming_etl_spark.streaming.cep import RelaxedCepAccumulator

    base = 1_700_000_000 * _US
    h = 3600 * _US
    df = spark.createDataFrame(
        [(1, 1, base, "view"), (2, 1, base + h, "click")],
        "event_id long, user_id long, us long, event_type string",
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
    )
    root = str(tmp_path / "flush_state")
    acc = RelaxedCepAccumulator(store_root=root)
    acc.add_batch(df, 0)
    assert acc.pending_count() > 0
    assert acc.flush(spark) == []
    assert [(t[0], t[1], t[3]) for t in acc.last_timeouts] == [
        (1, 1, "end_of_stream")
    ]
    acc2 = RelaxedCepAccumulator(store_root=root, spark=spark)
    assert acc2.pending_count() == 0 and acc2.last_batch_id == 0


def test_deferred_restore_on_first_fold(spark, tmp_path):
    """Constructing with store_root but without spark must NOT silently
    start from empty state: the restore happens on the first fold."""
    df, _ = _synth_stream(spark, 67, n_users=2, n_per_user=30)
    want = sorted(tuple(r) for r in cep.cep_greedy_matches(df).collect())
    ordered = df.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    root = str(tmp_path / "deferred_state")
    acc = CepAccumulator(store_root=root)
    got = list(acc.add_batch(spark.createDataFrame(ordered[:half], df.schema), 0))
    # restart WITHOUT passing spark — the old foot-gun
    acc2 = CepAccumulator(store_root=root)
    assert acc2.add_batch(spark.createDataFrame(ordered[:half], df.schema), 0) == []
    got.extend(acc2.add_batch(spark.createDataFrame(ordered[half:], df.schema), 1))
    assert sorted(got) == want


def test_idle_key_retention_evicts_and_survives_restart(spark, tmp_path):
    """T5: a key idle past retention_batches loses its pending tail —
    in memory AND in the durable state (a restart must not resurrect
    it); active keys are untouched."""
    base = 1_700_000_000 * _US

    def df(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, us long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "user_id",
            "event_type",
        )

    root = str(tmp_path / "ret_state")
    acc = CepAccumulator(store_root=root, retention_batches=2)
    # key 1 leaves a pending click, then goes idle; key 2 stays active
    acc.add_batch(df([(1, 1, base, "click"), (2, 2, base, "click")]), 0)
    assert 1 in acc.tails and 2 in acc.tails
    acc.add_batch(df([(3, 2, base + 1, "view")]), 1)
    acc.add_batch(df([(4, 2, base + 2, "view")]), 2)
    acc.add_batch(df([(5, 2, base + 3, "view")]), 3)
    assert 1 not in acc.tails and 2 in acc.tails
    # the durable state agrees after restart
    acc2 = CepAccumulator(store_root=root, spark=spark, retention_batches=2)
    assert 1 not in acc2.tails and 2 in acc2.tails


def test_accumulator_handles_alternation_steps(spark):
    """Alternation steps flow through the strict accumulator unchanged
    (the candidate pass and nxt pointers are type-agnostic)."""
    steps = ("view", ("click", "signup"), "purchase")
    df, _ = _synth_stream(spark, 71, n_users=2, n_per_user=40)
    # inject some signups so the alternation arm fires
    df = df.withColumn(
        "event_type",
        F.when(F.col("event_id") % 7 == 0, F.lit("signup")).otherwise(
            F.col("event_type")
        ),
    )
    want = sorted(
        tuple(r) for r in cep.cep_greedy_matches(df, steps).collect()
    )
    ordered = df.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    acc = CepAccumulator(steps=steps)
    got = list(acc.add_batch(spark.createDataFrame(ordered[:half], df.schema), 0))
    got.extend(acc.add_batch(spark.createDataFrame(ordered[half:], df.schema), 1))
    assert sorted(got) == want


def test_bucketed_saves_restore_union_across_versions(spark, tmp_path):
    """Saves slice to the touched buckets, so different batches write
    different store versions; a restore must stitch the latest bytes of
    EVERY bucket (disjoint keys per batch stress this)."""
    base = 1_700_000_000 * _US

    def df(rows):
        return spark.createDataFrame(
            rows, "event_id long, user_id long, us long, event_type string"
        ).select(
            "event_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "user_id",
            "event_type",
        )

    root = str(tmp_path / "bucketed_state")
    acc = CepAccumulator(store_root=root)
    # three batches, disjoint keys — each save touches different buckets
    acc.add_batch(df([(1, 101, base, "click")]), 0)
    acc.add_batch(df([(2, 202, base + 1, "click")]), 1)
    acc.add_batch(df([(3, 303, base + 2, "click")]), 2)
    assert set(acc.tails) == {101, 202, 303}
    acc2 = CepAccumulator(store_root=root, spark=spark)
    assert acc2.tails == acc.tails and acc2.last_batch_id == 2
    # and the stitched state still completes matches
    got = acc2.add_batch(df([(4, 202, base + 3, "click")]), 3)
    assert [(m[0], m[1], m[2]) for m in got] == [(202, 2, 4)]
