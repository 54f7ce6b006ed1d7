"""Broadcast State Pattern battery: scripted rule/event interleaving,
a random-interleaving model test, replay idempotence on both streams,
durable restart, and the broadcast-join plan pin."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from flink_streaming_etl_spark.streaming.rules import RULE_SCHEMA, BroadcastRuleEngine

_US = 1_000_000


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, us long, event_type string, value double"
    ).select(
        "event_id",
        F.timestamp_micros(F.col("us")).alias("ts"),
        "user_id",
        "event_type",
        "value",
    )


def _rules(spark, rows):
    return spark.createDataFrame(rows, RULE_SCHEMA)


def test_scripted_rule_lifecycle(spark):
    base = 1_700_000_000 * _US
    eng = BroadcastRuleEngine()
    # no rules yet: no hits
    assert eng.add_events_batch(_events(spark, [(1, 1, base, "click", 9.0)]), 0) == []
    # rule 10: click >= 5
    eng.add_rules_batch(_rules(spark, [("u", 10, "click", 5.0)]), 0)
    hits = eng.add_events_batch(
        _events(
            spark,
            [(2, 1, base + 1, "click", 6.0), (3, 1, base + 2, "click", 4.0),
             (4, 1, base + 3, "view", 9.0)],
        ),
        1,
    )
    assert [(h[0], h[1]) for h in hits] == [(10, 2)]
    # update tightens the threshold; same batch also adds a view rule
    eng.add_rules_batch(
        _rules(spark, [("u", 10, "click", 7.0), ("u", 11, "view", 1.0)]), 1
    )
    hits = eng.add_events_batch(
        _events(
            spark,
            [(5, 1, base + 4, "click", 6.0), (6, 1, base + 5, "click", 8.0),
             (7, 1, base + 6, "view", 2.0)],
        ),
        2,
    )
    assert sorted((h[0], h[1]) for h in hits) == [(10, 6), (11, 7)]
    # delete rule 10; last-op-per-rule-in-batch wins (u then d -> gone)
    eng.add_rules_batch(
        _rules(spark, [("u", 10, "click", 1.0), ("d", 10, None, None)]), 2
    )
    hits = eng.add_events_batch(
        _events(spark, [(8, 1, base + 7, "click", 9.0), (9, 1, base + 8, "view", 2.0)]),
        3,
    )
    assert sorted((h[0], h[1]) for h in hits) == [(11, 9)]
    assert eng.rule_count() == 1


@pytest.mark.parametrize("seed", [1, 2])
def test_random_interleaving_matches_model(spark, seed):
    """Any interleaving of rule updates and event batches matches a
    dict-based model evaluated with the same processing-time semantics."""
    rng = random.Random(seed)
    base = 1_700_000_000 * _US
    types = ["click", "view", "error"]
    model_rules: dict[int, tuple[str, float]] = {}
    want, got = [], []
    eng = BroadcastRuleEngine()
    eid = 0
    for step in range(12):
        if rng.random() < 0.4:
            rows = []
            for _ in range(rng.randint(1, 3)):
                rid = rng.randint(1, 5)
                if rng.random() < 0.25 and model_rules:
                    rows.append(("d", rid, None, None))
                    model_rules.pop(rid, None)
                else:
                    t, v = rng.choice(types), float(rng.randint(1, 9))
                    rows.append(("u", rid, t, v))
                    model_rules[rid] = (t, v)
            eng.add_rules_batch(_rules(spark, rows), step)
        else:
            evs = []
            for _ in range(rng.randint(1, 5)):
                eid += 1
                evs.append(
                    (eid, 1, base + eid, rng.choice(types), float(rng.randint(1, 9)))
                )
            got.extend(
                (h[0], h[1]) for h in eng.add_events_batch(_events(spark, evs), step)
            )
            for e_id, _u, _us, t, v in evs:
                for rid, (rt, rv) in model_rules.items():
                    if t == rt and v >= rv:
                        want.append((rid, e_id))
    assert sorted(got) == sorted(want)


def test_replay_and_restart(spark, tmp_path):
    base = 1_700_000_000 * _US
    root = str(tmp_path / "rules_state")
    eng = BroadcastRuleEngine(store_root=root)
    eng.add_rules_batch(_rules(spark, [("u", 1, "click", 3.0)]), 0)
    first = eng.add_events_batch(_events(spark, [(1, 1, base, "click", 5.0)]), 0)
    assert [(h[0], h[1]) for h in first] == [(1, 1)]
    # replays on both streams are no-ops
    eng.add_rules_batch(_rules(spark, [("u", 1, "click", 99.0)]), 0)
    assert eng.add_events_batch(_events(spark, [(1, 1, base, "click", 5.0)]), 0) == []
    assert eng.rule_count() == 1
    # restart: rules and both guards survive
    eng2 = BroadcastRuleEngine(store_root=root, spark=spark)
    assert eng2.last_rules_batch_id == 0 and eng2.last_events_batch_id == 0
    assert eng2.add_events_batch(_events(spark, [(1, 1, base, "click", 5.0)]), 0) == []
    hits = eng2.add_events_batch(_events(spark, [(2, 1, base + 1, "click", 4.0)]), 1)
    assert [(h[0], h[1]) for h in hits] == [(1, 2)]


def test_evaluation_plan_broadcasts_rules(spark):
    eng = BroadcastRuleEngine()
    eng.add_rules_batch(_rules(spark, [("u", 1, "click", 3.0)]), 0)
    ev = _events(spark, [(1, 1, 1_700_000_000 * _US, "click", 5.0)])
    plan = eng.evaluate(ev)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_null_rule_id_replace_and_delete(spark):
    """A NULL rule_id is a real key: upserts replace it (no duplicate
    accumulation) and deletes remove it."""
    base = 1_700_000_000 * _US
    eng = BroadcastRuleEngine()
    eng.add_rules_batch(_rules(spark, [("u", None, "click", 5.0)]), 0)
    eng.add_rules_batch(_rules(spark, [("u", None, "click", 7.0)]), 1)
    assert eng.rule_count() == 1
    hits = eng.add_events_batch(_events(spark, [(1, 1, base, "click", 8.0)]), 0)
    assert len(hits) == 1  # one rule, one hit — not two
    eng.add_rules_batch(_rules(spark, [("d", None, None, None)]), 2)
    assert eng.rule_count() == 0


def test_interleaved_saves_keep_restorable_state(spark, tmp_path):
    """Rules and events batch ids interleave and repeat across the two
    streams; every save must land in a FRESH store version (never
    rewriting the live one) and the state must restore after any
    prefix."""
    base = 1_700_000_000 * _US
    root = str(tmp_path / "rules_inter")
    eng = BroadcastRuleEngine(store_root=root)
    eng.add_rules_batch(_rules(spark, [("u", 1, "click", 3.0)]), 0)
    eng.add_events_batch(_events(spark, [(1, 1, base, "click", 5.0)]), 0)
    eng.add_rules_batch(_rules(spark, [("u", 2, "view", 1.0)]), 1)
    eng.add_events_batch(_events(spark, [(2, 1, base + 1, "view", 2.0)]), 1)
    eng2 = BroadcastRuleEngine(store_root=root, spark=spark)
    assert eng2.rule_count() == 2
    assert eng2.last_rules_batch_id == 1 and eng2.last_events_batch_id == 1
    hits = eng2.add_events_batch(_events(spark, [(3, 1, base + 2, "view", 2.0)]), 2)
    assert [(h[0], h[1]) for h in hits] == [(2, 3)]


def test_failed_rules_fold_retry_applies(spark):
    """A rules batch whose fold fails and is retried under the same id
    must apply (commit-after-success), not vanish forever."""
    from pyspark.sql.functions import udf

    eng = BroadcastRuleEngine()

    @udf("string")
    def boom(x):
        raise RuntimeError("transient fold failure")

    bad = spark.range(1).select(
        boom("id").alias("op"),
        F.lit(1).alias("rule_id").cast("long"),
        F.lit("click").alias("event_type"),
        F.lit(3.0).alias("min_value"),
    )
    with pytest.raises(Exception):
        eng.add_rules_batch(bad, 0)
    assert eng.last_rules_batch_id is None and eng.rule_count() == 0
    eng.add_rules_batch(_rules(spark, [("u", 1, "click", 3.0)]), 0)
    assert eng.rule_count() == 1


def test_rules_explicit_seq_col_is_layout_independent(spark):
    """r12 verdict #8: with a real per-record sequence column, "last op
    wins" resolves by the SEQUENCE, not the partition layout — the same
    interleaved multi-partition batch folds identically however Spark
    lays it out."""
    rows = [
        # (op, rule_id, event_type, min_value, seq) — the HIGHEST seq
        # per rule is authoritative: rule 1 ends at min_value=7, rule 2
        # is deleted, rule 3 survives its out-of-order early delete
        ("u", 1, "click", 3.0, 10),
        ("u", 1, "click", 99.0, 5),    # stale update, lower seq
        ("u", 1, "click", 7.0, 20),
        ("u", 2, "view", 1.0, 11),
        ("d", 2, None, None, 30),
        ("d", 3, None, None, 2),       # early delete, superseded
        ("u", 3, "purchase", 4.0, 8),
    ]
    want = {(1, "click", 7.0), (3, "purchase", 4.0)}
    for n_parts in (1, 4, 7):
        eng = BroadcastRuleEngine()
        chunk = spark.createDataFrame(
            rows,
            "op string, rule_id long, event_type string, min_value double, "
            "seq long",
        ).repartition(n_parts)  # scramble the layout
        eng.add_rules_batch(chunk, 0, seq_col="seq")
        got = {
            (r["rule_id"], r["event_type"], r["min_value"])
            for r in eng.rules.collect()
        }
        assert got == want, n_parts
