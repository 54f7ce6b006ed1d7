"""Streaming event-transition matrix: the Markov (from, to) counts of
:func:`~flink_streaming_etl_spark.operators.analytics
.event_transition_report` maintained across micro-batches.

Per micro-batch the HEAVY work stays distributed: one batch-sized Spark
job computes the WITHIN-batch transitions (the same lead() over
(user_id, ts, event_id) window as the batch operator) pre-aggregated to
(from, to) counts — a |event_types|²-bounded collect — plus each user's
FIRST and LAST event of the batch (one partial-aggregating min/max
struct fold; the collect is bounded by the batch's distinct users, never
corpus lifetime). The driver stitches batch boundaries: a user's stored
last event chains to their first event of the new batch (one transition
per returning user per batch), then the stored last event advances.
State is O(active users) last-event tuples + an O(types²) count matrix —
at 100 TB the per-user tuple moves into ``applyInPandasWithState``
(streaming/stateful.py's discipline); the batch job and the chaining
rule are unchanged by that swap.

Ordering contract: per-user events must arrive batch-monotonically (all
of a user's events in batch N+1 follow their events in batch N) — the
guarantee a PK-keyed Kafka topic gives per key (S6). Within a batch any
order works (the window sorts). Replays are idempotent by batch id;
idle-user retention (T5) evicts last-event state, trading the boundary
transition of a long-idle user's return for bounded state — the same
trade every accumulator here makes.

Equality pin (tests/test_round9.py): fed any batch-monotone split of the
events table, ``result()`` equals the batch operator's full-table output
— same (from_type, to_type, n_transitions, p_transition) rows.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


class EventTransitionAccumulator:
    """Incremental per-user transition counting with bounded state."""

    def __init__(self, retention_batches: int | None = None):
        self.retention_batches = retention_batches
        #: user_id -> (ts, event_id, event_type) of their last seen event
        self.last_event: dict[int, tuple] = {}
        self.last_active: dict[int, int] = {}
        self.counts: dict[tuple[str, str], int] = defaultdict(int)
        self.n_batches = 0
        self.last_batch_id: int | None = None

    # -- streaming side -----------------------------------------------------

    def add_batch(self, batch_events: DataFrame, batch_id: int | None = None) -> None:
        # Transactional fold ordering (T6, the streaming/cep.py
        # discipline): replay guard CHECKED here, batch id COMMITTED only
        # after the fold succeeds — a batch whose Spark job fails and is
        # retried under the same epoch id re-folds instead of being
        # misclassified as a replay.
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return  # replay — already folded
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        base = batch_events.select("user_id", "ts", "event_id", "event_type")
        within = (
            base.withColumn("to_type", F.lead("event_type").over(w))
            .filter(F.col("to_type").isNotNull())
            .groupBy(F.col("event_type").alias("f"), F.col("to_type").alias("t"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # |event_types|²-bounded
        )
        key = F.struct("ts", "event_id", "event_type")
        bounds = (
            base.groupBy("user_id")
            .agg(F.min(key).alias("first"), F.max(key).alias("last"))
            .collect()  # bounded by the batch's distinct users
        )

        # Spark work done — the driver fold below is pure dict ops
        self.n_batches += 1
        for r in within:
            self.counts[(r["f"], r["t"])] += r["n"]
        for r in bounds:
            uid = r["user_id"]
            prev = self.last_event.get(uid)
            if prev is not None:
                # boundary transition: stored last event → batch's first
                self.counts[(prev[2], r["first"]["event_type"])] += 1
            last = r["last"]
            self.last_event[uid] = (last["ts"], last["event_id"], last["event_type"])
            self.last_active[uid] = self.n_batches
        self._evict()

        if batch_id is not None:
            self.last_batch_id = int(batch_id)

    def _evict(self) -> None:
        if self.retention_batches is None:
            return
        horizon = self.n_batches - self.retention_batches
        if horizon <= 0:
            return
        for uid in [u for u, b in self.last_active.items() if b <= horizon]:
            del self.last_active[uid]
            self.last_event.pop(uid, None)

    def attach(self, stream_events: DataFrame, **start_kwargs):
        return (
            stream_events.writeStream.outputMode("append")
            .foreachBatch(lambda batch, bid: self.add_batch(batch, bid))
            .start(**start_kwargs)
        )

    # -- query side ---------------------------------------------------------

    def result(self, spark: SparkSession) -> DataFrame:
        """Accumulated transition matrix, identical schema (and, under the
        ordering contract, identical rows) to the batch operator."""
        import math

        by_from: dict[str, int] = defaultdict(int)
        for (f, _), n in self.counts.items():
            by_from[f] += n
        rows = [
            (f, t, int(n), math.floor(n / by_from[f] * 1000000.0) / 1000000.0)
            for (f, t), n in sorted(self.counts.items())
        ]
        return spark.createDataFrame(
            rows,
            "from_type string, to_type string, n_transitions long, "
            "p_transition double",
        )
