"""Streaming MATCH_RECOGNIZE — the CEP greedy matcher maintained across
micro-batches (FlinkCEP's keyed NFA as an accumulator; batch twin:
operators/cep.py).

Per batch the HEAVY work stays distributed: the stored pending tails of
the batch's users (≤ L-1 rows each) are unioned with the batch and the
batch kernel :func:`~flink_streaming_etl_spark.operators.cep.
cep_greedy_with_tails` runs the same window-algebra candidate pass +
pointer-doubling greedy selection as the batch operator. Finalized
matches are RETURNED from ``add_batch`` (the FlinkCEP emission model —
matches flow downstream, they are not accumulator state).

Why emitted matches are final and the stitching is exact:

* greedy (AFTER MATCH SKIP PAST LAST ROW) is left-to-right — rows that
  arrive later can never create an earlier candidate, so any match found
  over (pending ∪ batch) is the match the full-stream greedy would find;
* strict contiguity + batch-monotone delivery mean only the trailing
  unconsumed ≤ L-1 rows of a key can sit inside a candidate that also
  contains unseen rows — everything older is decided;
* the WITHIN bound makes event-time aging exact: every row of a match
  lies within ``within`` of the match's first row, so a pending row
  older than ``within`` relative to its key's newest row can never
  co-occur with any future row (FlinkCEP prunes partial matches on
  watermark advance by the same argument).

State: O(active keys · (L-1)) pending rows — bounded, and self-evicting
by the WITHIN bound. No corpus-lifetime driver structure; the per-batch
driver transfer is the batch's matches + the batch's keys' tails, both
batch-bounded (the paths.py discipline). Replays are idempotent by
batch id (T6); ``store_root`` makes the state durable through
:class:`~flink_streaming_etl_spark.streaming.state_store.
AccumulatorStateStore` (save after every folded batch, restore on
construction) so a restart under a persistent streaming checkpoint
resumes exactly.

Ordering contract: per-key batch-monotone delivery (the PK-keyed Kafka
guarantee, S6) — every event in batch N sorts after the same key's
events in batches < N under (ts, event_id); within a batch any order.

Equality pin (tests/test_cep.py): over ANY batch-monotone chunking, the
concatenated ``add_batch`` outputs equal the batch operator's matches
on the full table (no flush step needed — a pending tail can never
contain a full match, or greedy would have taken it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from flink_streaming_etl_spark.operators.cep import (
    CEP_FUNNEL_STEPS,
    CEP_GREEDY_STEPS,
    CEP_WITHIN_HOURS,
    cep_greedy_with_tails,
    cep_quantified_with_tails,
    cep_relaxed_with_state,
)
from flink_streaming_etl_spark.streaming.state_store import AccumulatorStateStore

_TAIL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)


class CepAccumulator:
    """Incremental greedy pattern matching with bounded pending state."""

    def __init__(
        self,
        steps: tuple[str, ...] = CEP_GREEDY_STEPS,
        within_hours: int = CEP_WITHIN_HOURS,
        store_root: str | None = None,
        spark: SparkSession | None = None,
    ):
        self.steps = tuple(steps)
        self.within_hours = int(within_hours)
        #: user_id -> list of pending (us, event_id, event_type), ≤ L-1 rows
        self.tails: dict[int, list[tuple]] = {}
        self.last_batch_id: int | None = None
        self.store = AccumulatorStateStore(store_root) if store_root else None
        if self.store is not None and spark is not None:
            self._restore(spark)

    # -- durability -----------------------------------------------------

    def _restore(self, spark: SparkSession) -> None:
        loaded = self.store.load(spark)
        if loaded is None:
            return
        bid, rels, extra = loaded
        self.last_batch_id = extra.get("last_batch_id", bid)
        self.tails = {}
        if "tails" in rels:
            for r in rels["tails"].collect():  # bounded: ≤ (L-1)·active keys
                self.tails.setdefault(r["user_id"], []).append(
                    (r["us"], r["event_id"], r["event_type"])
                )
            for rows in self.tails.values():
                rows.sort()

    def _persist(self, spark: SparkSession, batch_id: int) -> None:
        if self.store is None:
            return
        rows = [
            (uid, us, eid, t)
            for uid, pend in self.tails.items()
            for (us, eid, t) in pend
        ]
        df = spark.createDataFrame(rows, _TAIL_SCHEMA)
        self.store.save(
            batch_id, {"tails": df}, extra={"last_batch_id": int(batch_id)}
        )

    # -- streaming side --------------------------------------------------

    def add_batch(
        self, batch_events: DataFrame, batch_id: int | None = None
    ) -> list[tuple]:
        """Fold one micro-batch; return its finalized matches as tuples
        (user_id, start_event_id, end_event_id, start_us, end_us)."""
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return []  # replay — already folded and emitted
            self.last_batch_id = int(batch_id)
        spark = batch_events.sparkSession
        batch = batch_events.select("user_id", "ts", "event_id", "event_type")
        # pending tails of THIS batch's keys only — per-batch work scales
        # with the batch, not with lifetime key count
        users = {
            r["user_id"] for r in batch.select("user_id").distinct().collect()
        }
        pend_rows = [
            (uid, us, eid, t)
            for uid in users
            for (us, eid, t) in self.tails.get(uid, [])
        ]
        if pend_rows:
            pend = spark.createDataFrame(pend_rows, _TAIL_SCHEMA).select(
                "user_id",
                F.timestamp_micros(F.col("us")).alias("ts"),
                "event_id",
                "event_type",
            )
            batch = batch.unionByName(pend)
        matches_df, tails_df = cep_greedy_with_tails(
            batch, self.steps, self.within_hours
        )
        matches = [
            (
                r["user_id"],
                r["start_event_id"],
                r["end_event_id"],
                r["start_us"],
                r["end_us"],
            )
            for r in matches_df.collect()
        ]
        for uid in users:
            self.tails.pop(uid, None)
        for r in tails_df.collect():  # ≤ (L-1)·batch keys
            self.tails.setdefault(r["user_id"], []).append(
                (r["us"], r["event_id"], r["event_type"])
            )
        for uid in users:
            if uid in self.tails:
                self.tails[uid].sort()
        if batch_id is not None:
            self._persist(spark, batch_id)
        return matches

    def attach(self, stream_events: DataFrame, on_matches=None, **start_kwargs):
        """foreachBatch driver: fold each micro-batch, hand its finalized
        matches to ``on_matches`` (the downstream sink)."""

        def _fold(batch: DataFrame, bid: int) -> None:
            out = self.add_batch(batch, bid)
            if on_matches is not None:
                on_matches(out)

        return (
            stream_events.writeStream.outputMode("append")
            .foreachBatch(_fold)
            .start(**start_kwargs)
        )

    # -- query side --------------------------------------------------------

    def pending_count(self) -> int:
        return sum(len(v) for v in self.tails.values())


class RelaxedCepAccumulator:
    """Streaming FlinkCEP followedBy (relaxed contiguity, SKIP PAST LAST
    ROW) — the within-horizon partial-match state model.

    Unlike the strict-contiguity :class:`CepAccumulator` (whose pending
    state is ≤ L-1 rows per key), relaxed matching must hold every row
    from the first unresolved start onward: a blocked scan can still
    bind any of them once the pattern completes. The WITHIN bound makes
    that state the per-key event-time horizon — an unresolved start
    older than WITHIN relative to the key's newest row is dead, and all
    carried rows are newer than the first unresolved start. This is
    EXACTLY FlinkCEP's partial-match state (pruned on watermark
    advance); the batch kernel
    :func:`~flink_streaming_etl_spark.operators.cep.
    cep_relaxed_with_state` derives matches-final-so-far + carry-over
    in one distributed pass.

    Emission timing is event-driven, not watermark-driven: a pending
    start resolves in the batch that completes it, expires it, or
    consumes it inside an earlier match's span. For a single linear
    pattern the bindings are MONOTONE (an earlier start's step bindings
    never sort after a later start's), so a complete chain can never
    sit blocked behind a pending one — which means ``flush()`` provably
    returns []; it exists to make end-of-stream explicit in the
    equality pin, and to stay correct for future non-monotone pattern
    extensions (alternation, quantifiers) where blocked-valid chains
    become possible.

    Equality pin (tests/test_cep.py): over ANY batch-monotone chunking,
    add_batch emissions + flush() equal the batch
    ``cep_relaxed_matches`` on the full table."""

    def __init__(
        self,
        steps: tuple[str, ...] = CEP_FUNNEL_STEPS,
        within_hours: int = CEP_WITHIN_HOURS,
        store_root: str | None = None,
        spark: SparkSession | None = None,
    ):
        self.steps = tuple(steps)
        self.within_hours = int(within_hours)
        #: user_id -> list of carried (us, event_id, event_type), within-horizon
        self.tails: dict[int, list[tuple]] = {}
        self.last_batch_id: int | None = None
        self.store = AccumulatorStateStore(store_root) if store_root else None
        if self.store is not None and spark is not None:
            self._restore(spark)

    _restore = CepAccumulator._restore
    _persist = CepAccumulator._persist

    def add_batch(
        self, batch_events: DataFrame, batch_id: int | None = None
    ) -> list[tuple]:
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return []
            self.last_batch_id = int(batch_id)
        spark = batch_events.sparkSession
        batch = batch_events.select("user_id", "ts", "event_id", "event_type")
        users = {
            r["user_id"] for r in batch.select("user_id").distinct().collect()
        }
        pend_rows = [
            (uid, us, eid, t)
            for uid in users
            for (us, eid, t) in self.tails.get(uid, [])
        ]
        if pend_rows:
            pend = spark.createDataFrame(pend_rows, _TAIL_SCHEMA).select(
                "user_id",
                F.timestamp_micros(F.col("us")).alias("ts"),
                "event_id",
                "event_type",
            )
            batch = batch.unionByName(pend)
        matches_df, tails_df = cep_relaxed_with_state(
            batch, self.steps, self.within_hours
        )
        matches = [
            (
                r["user_id"],
                r["start_event_id"],
                r["end_event_id"],
                r["start_us"],
                r["end_us"],
            )
            for r in matches_df.collect()
        ]
        for uid in users:
            self.tails.pop(uid, None)
        for r in tails_df.collect():  # within-horizon rows of the batch's keys
            self.tails.setdefault(r["user_id"], []).append(
                (r["us"], r["event_id"], r["event_type"])
            )
        for uid in users:
            if uid in self.tails:
                self.tails[uid].sort()
        if batch_id is not None:
            self._persist(spark, batch_id)
        return matches

    def flush(self, spark: SparkSession) -> list[tuple]:
        """End-of-stream: resolve every pending chain (no future rows →
        all dead) and return the remaining matches. State is cleared."""
        rows = [
            (uid, us, eid, t)
            for uid, pend in self.tails.items()
            for (us, eid, t) in pend
        ]
        self.tails = {}
        if not rows:
            return []
        from flink_streaming_etl_spark.operators.cep import cep_relaxed_matches

        rem = spark.createDataFrame(rows, _TAIL_SCHEMA).select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "event_id",
            "event_type",
        )
        return [
            (
                r["user_id"],
                r["start_event_id"],
                r["end_event_id"],
                r["start_us"],
                r["end_us"],
            )
            for r in cep_relaxed_matches(rem, self.steps, self.within_hours).collect()
        ]

    attach = CepAccumulator.attach

    def pending_count(self) -> int:
        return sum(len(v) for v in self.tails.values())


_QTAIL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


class QuantifiedCepAccumulator:
    """Streaming ``PATTERN (A B+ C)`` with MEASURES — completes the
    streaming CEP trio (strict / relaxed / quantified).

    Pending state per key is the only suffix a future match can use:
    the last row if A-typed, or the trailing loop-run plus its
    preceding A (see :func:`~flink_streaming_etl_spark.operators.cep.
    cep_quantified_with_tails` for the proof) — WITHIN-horizon bounded,
    aged on the pending A row (exact). Completed matches are closed by
    their C row, so every emission is final and no flush step exists.
    Replays are idempotent by batch id; ``store_root`` makes the state
    durable (same contract as the sibling accumulators)."""

    def __init__(
        self,
        pre: str = "view",
        loop: str = "click",
        post: str = "purchase",
        within_hours: int = CEP_WITHIN_HOURS,
        store_root: str | None = None,
        spark: SparkSession | None = None,
    ):
        self.pre, self.loop, self.post = pre, loop, post
        self.within_hours = int(within_hours)
        #: user_id -> list of pending (us, event_id, event_type, value)
        self.tails: dict[int, list[tuple]] = {}
        self.last_batch_id: int | None = None
        self.store = AccumulatorStateStore(store_root) if store_root else None
        if self.store is not None and spark is not None:
            self._restore(spark)

    def _restore(self, spark: SparkSession) -> None:
        loaded = self.store.load(spark)
        if loaded is None:
            return
        bid, rels, extra = loaded
        self.last_batch_id = extra.get("last_batch_id", bid)
        self.tails = {}
        if "tails" in rels:
            for r in rels["tails"].collect():
                self.tails.setdefault(r["user_id"], []).append(
                    (r["us"], r["event_id"], r["event_type"], r["value"])
                )
            for rows in self.tails.values():
                rows.sort(key=lambda t: (t[0], t[1]))

    def _persist(self, spark: SparkSession, batch_id: int) -> None:
        if self.store is None:
            return
        rows = [
            (uid, us, eid, t, v)
            for uid, pend in self.tails.items()
            for (us, eid, t, v) in pend
        ]
        df = spark.createDataFrame(rows, _QTAIL_SCHEMA)
        self.store.save(
            batch_id, {"tails": df}, extra={"last_batch_id": int(batch_id)}
        )

    def add_batch(
        self, batch_events: DataFrame, batch_id: int | None = None
    ) -> list[tuple]:
        """Fold one micro-batch; return its finalized matches as tuples
        (user_id, start_event_id, end_event_id, n_loop, loop_value_sum,
        start_us, end_us)."""
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return []
            self.last_batch_id = int(batch_id)
        spark = batch_events.sparkSession
        batch = batch_events.select(
            "user_id", "ts", "event_id", "event_type", "value"
        )
        users = {
            r["user_id"] for r in batch.select("user_id").distinct().collect()
        }
        pend_rows = [
            (uid, us, eid, t, v)
            for uid in users
            for (us, eid, t, v) in self.tails.get(uid, [])
        ]
        if pend_rows:
            pend = spark.createDataFrame(pend_rows, _QTAIL_SCHEMA).select(
                "user_id",
                F.timestamp_micros(F.col("us")).alias("ts"),
                "event_id",
                "event_type",
                "value",
            )
            batch = batch.unionByName(pend)
        matches_df, tails_df = cep_quantified_with_tails(
            batch, self.pre, self.loop, self.post, self.within_hours
        )
        matches = [
            (
                r["user_id"],
                r["start_event_id"],
                r["end_event_id"],
                r["n_loop"],
                r["loop_value_sum"],
                r["start_us"],
                r["end_us"],
            )
            for r in matches_df.collect()
        ]
        for uid in users:
            self.tails.pop(uid, None)
        for r in tails_df.collect():  # WITHIN-horizon rows of the batch's keys
            self.tails.setdefault(r["user_id"], []).append(
                (r["us"], r["event_id"], r["event_type"], r["value"])
            )
        for uid in users:
            if uid in self.tails:
                self.tails[uid].sort(key=lambda t: (t[0], t[1]))
        if batch_id is not None:
            self._persist(spark, batch_id)
        return matches

    attach = CepAccumulator.attach

    def pending_count(self) -> int:
        return sum(len(v) for v in self.tails.values())
