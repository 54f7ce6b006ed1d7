"""Streaming MATCH_RECOGNIZE — the CEP matchers maintained across
micro-batches (FlinkCEP's keyed NFA as accumulators; batch twins:
operators/cep.py).

Per batch the HEAVY work stays distributed: the stored pending tails of
the batch's keys are unioned with the batch and the corresponding batch
kernel (``cep_greedy_with_tails`` / ``cep_relaxed_with_state`` /
``cep_quantified_with_tails``) runs the same window-algebra passes as
the batch operator. Finalized matches are RETURNED from ``add_batch``
(the FlinkCEP emission model — matches flow downstream, they are not
accumulator state).

Why emitted matches are final and the stitching is exact, per matcher:

* STRICT contiguity (:class:`CepAccumulator`): greedy is left-to-right
  and rows that arrive later can never create an earlier candidate;
  only the trailing unconsumed ≤ L-1 rows of a key can sit inside a
  candidate that also contains unseen rows. State: ≤ L-1 rows per key.
* RELAXED contiguity (:class:`RelaxedCepAccumulator`): every start row
  is definitively valid / pending / dead (bindings are monotone), the
  scan is a chain over valid+pending nodes with pending terminal, and
  the carried rows are the per-key WITHIN horizon — FlinkCEP's own
  partial-match state bound (see ``cep_relaxed_with_state``).
* QUANTIFIED A B+ C (:class:`QuantifiedCepAccumulator`): a future
  match's existing rows are a contiguous suffix starting at its A row,
  so the carry-over is the last row when A-typed or the trailing
  loop-run plus its preceding A (see ``cep_quantified_with_tails``).

The WITHIN bound makes event-time aging exact in all three: every row
of a match lies within ``within`` of the match's first row, so a
pending row older than ``within`` relative to its key's newest row can
never co-occur with any future row (the boundary is inclusive — a row
EXACTLY ``within`` old can still head a span-``within`` match).

Transactional fold ordering (T6, at-least-once): the replay guard is
CHECKED first, but the batch id and the in-memory tail state are
COMMITTED only after the fold and the durable save succeed — a batch
that fails mid-fold and is retried under the same epoch id re-folds
cleanly instead of being misclassified as an already-seen replay, and a
crash between save and commit restores the saved state on restart.

Ordering contract: per-key batch-monotone delivery (the PK-keyed Kafka
guarantee, S6) — every event in batch N sorts after the same key's
events in batches < N under (ts, event_id); within a batch any order.

Equality pins (tests/test_cep.py, tests/test_cep_properties.py): over
ANY batch-monotone chunking, concatenated ``add_batch`` outputs
(+ ``flush()`` for relaxed) equal the batch operator on the full table.
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
from flink_streaming_etl_spark.streaming.state_store import (
    AccumulatorStateStore,
    BucketedState,
)

_TAIL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
    ]
)

_QTAIL_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("us", LongType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


class _BaseCepAccumulator:
    """Shared fold machinery: tail re-injection, kernel dispatch,
    durable save, transactional commit. Subclasses set ``_schema`` (the
    tail relation; field 0 is user_id, field 1 the event-time micros),
    ``_match_fields`` (emission tuple shape) and implement
    ``_kernel(batch) -> (matches_df, tails_df)``."""

    _schema: StructType
    _match_fields: tuple[str, ...]

    def __init__(
        self,
        store_root: str | None = None,
        spark: SparkSession | None = None,
        retention_batches: int | None = None,
    ):
        #: user_id -> sorted list of pending row tuples (schema fields 1..)
        self.tails: dict = {}
        #: idle-state retention (T5, the Flink state-TTL discipline):
        #: keys idle for ``retention_batches`` folds have their pending
        #: tails evicted. Per-key state is already WITHIN-aged, so this
        #: bounds the OTHER axis — lifetime key count. The trade is the
        #: same as paths.py documents: a key that resumes after idling
        #: past the horizon (and still within the event-time WITHIN of
        #: its pending rows) loses the cross-gap match.
        self.retention_batches = retention_batches
        self._last_active: dict = {}
        #: user_id -> stable store bucket (Spark-side pmod(hash, N) —
        #: cached so a save only serializes the touched buckets' keys)
        self._bucket: dict = {}
        self._n_folds = 0
        self.last_batch_id: int | None = None
        #: monotone store-version counter — decoupled from batch ids so a
        #: flush (or any extra save) gets a FRESH version directory
        #: instead of rewriting the live one
        self._save_seq = 0
        self.store = AccumulatorStateStore(store_root) if store_root else None
        self._restored = self.store is None
        if self.store is not None and spark is not None:
            self._restore(spark)

    # -- durability ------------------------------------------------------

    def _tail_fields(self) -> list[str]:
        return [f.name for f in self._schema.fields[1:]]

    def _restore(self, spark: SparkSession) -> None:
        self._restored = True
        loaded = self.store.load(spark)
        if loaded is None:
            return
        bid, rels, extra = loaded
        self._save_seq = bid
        self.last_batch_id = extra.get("last_batch_id", bid)
        self.tails = {}
        fields = self._tail_fields()
        if "tails" in rels:
            for r in rels["tails"].collect():  # state-bounded (see class doc)
                self.tails.setdefault(r["user_id"], []).append(
                    tuple(r[f] for f in fields)
                )
            for rows in self.tails.values():
                rows.sort(key=lambda t: (t[0], t[1]))
            # restored keys count as active NOW so idle-state retention
            # can still reach them (otherwise a restart would immortalize
            # pre-crash idle state)
            for uid in self.tails:
                self._last_active.setdefault(uid, self._n_folds)

    _N_BUCKETS = 64

    def _buckets_for(self, spark: SparkSession, keys: set) -> set:
        """Store bucket ids for ``keys``, computing unknown ones with
        the SAME JVM-side hash the store's bucket map uses (a Python
        hash would disagree)."""
        unknown = [u for u in keys if u not in self._bucket]
        if unknown:
            key_type = self._schema.fields[0].dataType
            kdf = spark.createDataFrame(
                [(u,) for u in unknown],
                StructType([StructField("user_id", key_type)]),
            )
            for r in kdf.select(
                "user_id",
                F.pmod(F.hash("user_id"), F.lit(self._N_BUCKETS)).alias("b"),
            ).collect():
                self._bucket[r["user_id"]] = r["b"]
        return {self._bucket[u] for u in keys}

    def _save(
        self,
        spark: SparkSession,
        last_bid: int | None,
        tails: dict,
        touched_users: set | None = None,
    ) -> None:
        """Durable save under a fresh store version. The tails relation
        is hash-bucketed on the key and only the TOUCHED buckets are
        rewritten (state_store's incremental-checkpoint trade: write
        volume ∝ changed buckets, not lifetime key count; the driver
        still serializes the full dict — bounded by the accumulator's
        own state bound). ``touched_users=None`` → full snapshot."""
        if self.store is None:
            return
        key_type = self._schema.fields[0].dataType
        touched = None
        if touched_users is not None:
            # serialize ONLY the touched buckets' keys — the save cost is
            # ∝ the batch's bucket footprint, not lifetime key count
            tb = self._buckets_for(spark, set(touched_users))
            self._buckets_for(spark, set(tails))
            rows = [
                (uid, *t)
                for uid, pend in tails.items()
                if self._bucket[uid] in tb
                for t in pend
            ]
            touched = spark.createDataFrame(
                [(u,) for u in touched_users],
                StructType([StructField("user_id", key_type)]),
            )
        else:
            rows = [(uid, *t) for uid, pend in tails.items() for t in pend]
        df = spark.createDataFrame(rows, self._schema)
        self._save_seq += 1
        self.store.save(
            self._save_seq,
            {},
            extra={"last_batch_id": last_bid},
            bucketed={
                "tails": BucketedState(
                    df, ["user_id"], n_buckets=self._N_BUCKETS, touched=touched
                )
            },
        )

    # -- streaming side --------------------------------------------------

    def _kernel(self, batch: DataFrame):  # pragma: no cover - abstract
        raise NotImplementedError

    def _reset_side_outputs(self) -> None:
        """Clear per-batch side channels (overridden where they exist) —
        a replayed batch must not leave the previous fold's side output
        visible as if it were its own."""

    def add_batch(
        self,
        batch_events: DataFrame,
        batch_id: int | None = None,
        on_matches=None,
    ) -> list[tuple]:
        """Fold one micro-batch; return its finalized matches (tuples in
        ``_match_fields`` order). ``on_matches`` (the downstream sink)
        is invoked BEFORE the durable commit: a sink failure fails the
        batch pre-commit, so Spark's retry re-folds and re-delivers
        (at-least-once) instead of losing the emissions behind an
        already-committed replay guard."""
        spark = batch_events.sparkSession
        if not self._restored:
            self._restore(spark)
        if (
            batch_id is not None
            and self.last_batch_id is not None
            and batch_id <= self.last_batch_id
        ):
            self._reset_side_outputs()
            return []  # replay of a COMMITTED batch — already emitted
        cols = ["user_id", "ts", *self._tail_fields()[1:]]
        batch = batch_events.select(*cols)
        # pending tails of THIS batch's keys only — per-batch work scales
        # with the batch, not with lifetime key count
        users = {
            r["user_id"] for r in batch.select("user_id").distinct().collect()
        }
        pend_rows = [
            (uid, *t) for uid in users for t in self.tails.get(uid, [])
        ]
        if pend_rows:
            pend = spark.createDataFrame(pend_rows, self._schema).select(
                "user_id",
                F.timestamp_micros(F.col("us")).alias("ts"),
                *self._tail_fields()[1:],
            )
            batch = batch.unionByName(pend)
        matches_df, tails_df = self._kernel(batch)
        matches = [
            tuple(r[f] for f in self._match_fields)
            for r in matches_df.collect()
        ]
        fields = self._tail_fields()
        fresh: dict = {}
        for r in tails_df.collect():  # state-bounded (see class doc)
            fresh.setdefault(r["user_id"], []).append(
                tuple(r[f] for f in fields)
            )
        for rows in fresh.values():
            rows.sort(key=lambda t: (t[0], t[1]))
        # deliver BEFORE the durable commit (see docstring)
        if on_matches is not None:
            on_matches(matches)
        # retention (T5): decide evictions BEFORE the save so the
        # evicted keys' buckets are rewritten in this version (a restart
        # must not resurrect idle state the fold just dropped)
        evicted = self._idle_keys(users)
        # durable save from the NEW state, then commit memory + batch id
        if batch_id is not None:
            new_tails = {
                uid: pend
                for uid, pend in self.tails.items()
                if uid not in users and uid not in evicted
            }
            new_tails.update(fresh)
            self._save(
                spark, batch_id, new_tails, touched_users=users | evicted
            )
        for uid in users:
            self.tails.pop(uid, None)
        self.tails.update(fresh)
        self._n_folds += 1
        for uid in users:
            self._last_active[uid] = self._n_folds
        for uid in evicted:
            self._last_active.pop(uid, None)
            self.tails.pop(uid, None)
        if batch_id is not None:
            self.last_batch_id = int(batch_id)
        return matches

    def _idle_keys(self, active_now: set) -> set:
        """Keys idle past the retention horizon, excluding this batch's
        active keys (T5 eviction; best-effort clock — a retried batch
        may tick the fold counter twice, which only shortens an idle
        key's grace by one fold)."""
        if self.retention_batches is None:
            return set()
        horizon = (self._n_folds + 1) - self.retention_batches
        if horizon <= 0:
            return set()
        return {
            u
            for u, b in self._last_active.items()
            if b <= horizon and u not in active_now
        }

    def attach(self, stream_events: DataFrame, on_matches=None, **start_kwargs):
        """foreachBatch driver: fold each micro-batch, hand its finalized
        matches to ``on_matches`` (the downstream sink)."""

        def _fold(batch: DataFrame, bid: int) -> None:
            # delivery happens INSIDE add_batch, before the durable
            # commit — a sink failure fails the epoch pre-commit
            self.add_batch(batch, bid, on_matches=on_matches)

        return (
            stream_events.writeStream.outputMode("append")
            .foreachBatch(_fold)
            .start(**start_kwargs)
        )

    # -- query side ------------------------------------------------------

    def pending_count(self) -> int:
        return sum(len(v) for v in self.tails.values())


class CepAccumulator(_BaseCepAccumulator):
    """Incremental STRICT-contiguity greedy matching: pending state is
    ≤ L-1 unconsumed trailing rows per key, WITHIN-aged (exact)."""

    _schema = _TAIL_SCHEMA
    _match_fields = (
        "user_id",
        "start_event_id",
        "end_event_id",
        "start_us",
        "end_us",
    )

    def __init__(
        self,
        steps: tuple[str, ...] = CEP_GREEDY_STEPS,
        within_hours: int = CEP_WITHIN_HOURS,
        store_root: str | None = None,
        spark: SparkSession | None = None,
        retention_batches: int | None = None,
    ):
        self.steps = tuple(steps)
        self.within_hours = int(within_hours)
        super().__init__(store_root, spark, retention_batches)

    def _kernel(self, batch: DataFrame):
        return cep_greedy_with_tails(batch, self.steps, self.within_hours)


class RelaxedCepAccumulator(_BaseCepAccumulator):
    """Streaming FlinkCEP followedBy (relaxed contiguity, SKIP PAST
    LAST ROW) — the within-horizon partial-match state model.

    Emission timing is event-driven: a pending start resolves in the
    batch that completes it, expires it, or consumes it inside an
    earlier match's span. For a single linear pattern the bindings are
    MONOTONE (an earlier start's step bindings never sort after a later
    start's), so a complete chain can never sit blocked behind a
    pending one — which means ``flush()`` provably returns []; it
    exists to make end-of-stream explicit in the equality pin, and to
    stay correct for future non-monotone pattern extensions where
    blocked-valid chains become possible."""

    _schema = _TAIL_SCHEMA
    _match_fields = (
        "user_id",
        "start_event_id",
        "end_event_id",
        "start_us",
        "end_us",
    )

    def __init__(
        self,
        steps: tuple[str, ...] = CEP_FUNNEL_STEPS,
        within_hours: int = CEP_WITHIN_HOURS,
        store_root: str | None = None,
        spark: SparkSession | None = None,
        retention_batches: int | None = None,
    ):
        self.steps = tuple(steps)
        self.within_hours = int(within_hours)
        #: the most recent batch's timed-out partial starts
        self.last_timeouts: list[tuple] = []
        super().__init__(store_root, spark, retention_batches)

    def _reset_side_outputs(self) -> None:
        self.last_timeouts = []

    def _kernel(self, batch: DataFrame):
        matches, tails, timeouts = cep_relaxed_with_state(
            batch, self.steps, self.within_hours, with_timeouts=True
        )
        # FlinkCEP's timed-out-partial side output: stash the batch's
        # timeouts (each dead start reports exactly once — see kernel);
        # read via last_timeouts after add_batch
        self.last_timeouts = [
            (r["user_id"], r["start_event_id"], r["start_us"], r["reason"])
            for r in timeouts.collect()
        ]
        return matches, tails

    def flush(self, spark: SparkSession) -> list[tuple]:
        """End-of-stream: every incomplete pending chain is dead (no
        future rows), so the remaining matches are returned and the
        unresolved starts land on the timeout side output with reason
        'end_of_stream' (the batch twin cep_timeout_report's label;
        over-WITHIN completions keep 'over_within', and starts consumed
        inside a flush-emitted match report like any other dropped dead
        start). The cleared state is saved durably under a fresh store
        version so a post-flush restart does not resurrect resolved
        state."""
        rows = [(uid, *t) for uid, pend in self.tails.items() for t in pend]
        if not rows:
            self.last_timeouts = []
            return []
        # compute FIRST, clear and save after (the same fold-then-commit
        # ordering as add_batch — a failure here leaves state intact)
        rem = spark.createDataFrame(rows, self._schema).select(
            "user_id",
            F.timestamp_micros(F.col("us")).alias("ts"),
            "event_id",
            "event_type",
        )
        matches_df, _tails, timeouts = cep_relaxed_with_state(
            rem,
            self.steps,
            self.within_hours,
            with_timeouts=True,
            force_expire=True,
        )
        out = [
            tuple(r[f] for f in self._match_fields)
            for r in matches_df.collect()
        ]
        reported = [
            (
                r["user_id"],
                r["start_event_id"],
                r["start_us"],
                "end_of_stream" if r["reason"] == "expired" else r["reason"],
            )
            for r in timeouts.collect()
        ]
        if self.store is not None:
            self._save(spark, self.last_batch_id, {}, touched_users=None)
        self.tails = {}
        self.last_timeouts = reported
        return out


class QuantifiedCepAccumulator(_BaseCepAccumulator):
    """Streaming ``PATTERN (A B+ C)`` with MEASURES — completes the
    streaming CEP trio. Completed matches are closed by their C row, so
    every emission is final and no flush step exists."""

    _schema = _QTAIL_SCHEMA
    _match_fields = (
        "user_id",
        "start_event_id",
        "end_event_id",
        "n_loop",
        "loop_value_sum",
        "start_us",
        "end_us",
    )

    def __init__(
        self,
        pre: str = "view",
        loop: str = "click",
        post: str = "purchase",
        within_hours: int = CEP_WITHIN_HOURS,
        store_root: str | None = None,
        spark: SparkSession | None = None,
        retention_batches: int | None = None,
    ):
        self.pre, self.loop, self.post = pre, loop, post
        self.within_hours = int(within_hours)
        super().__init__(store_root, spark, retention_batches)

    def _kernel(self, batch: DataFrame):
        return cep_quantified_with_tails(
            batch, self.pre, self.loop, self.post, self.within_hours
        )
