"""Streaming event-transition matrix: the Markov (from, to) counts of
:func:`~flink_streaming_etl_spark.operators.analytics
.event_transition_report` maintained across micro-batches.

Since round 13 the per-user last-event state is a DISTRIBUTED relation
``(user_id, ts, event_id, event_type, _last_fold)`` (r12 verdict #1 —
the driver ``last_event``/``last_active`` dicts grew with the corpus's
distinct users). Per micro-batch:

- WITHIN-batch transitions: the same lead() over (user_id, ts,
  event_id) window as the batch operator, pre-aggregated to (from, to)
  counts — a |event_types|²-bounded collect (O(results), not O(state)).
- BOUNDARY transitions: the batch's per-user FIRST event joins the
  last-event relation ON THE EXECUTORS and folds to (from, to) counts —
  another |types|²-bounded collect. The old per-returning-user driver
  loop is gone; no user row ever visits the driver.
- state fold: the batch's per-user LAST events replace their rows via
  broadcast anti ∪ union (the ``streaming/cep.py`` discipline), with
  idle retention (T5) decided relation-side on the carried
  ``_last_fold`` stamp.

The count matrix itself stays a driver dict — it is |types|²-bounded by
construction, the same bound that makes the two collects safe. Durable
state rides ``BucketedState`` when ``store_root`` is given.

Ordering contract: per-user events must arrive batch-monotonically (the
PK-keyed Kafka guarantee, S6). Replays are idempotent by batch id;
fold-then-commit (T6): folds land in locals/fresh relations and
``self.*`` + ``last_batch_id`` commit only after every Spark phase and
the durable save succeed.

Equality pin (tests/test_round9.py): fed any batch-monotone split of
the events table, ``result()`` equals the batch operator's full-table
output.

The ``applyInPandasWithState`` twin lives in
:class:`StatefulEventTransitions` below — the native executor-resident
state path (Spark's GroupState) pinned equal to this foreachBatch
accumulator; at cluster scale that twin is the idiomatic home for the
per-user tuple, with Spark itself owning state placement, checkpointing
and timeout eviction.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from flink_streaming_etl_spark.ckpt import eager_checkpoint

_LAST_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_id", LongType()),
        StructField("event_type", StringType()),
        StructField("_last_fold", LongType()),
    ]
)


class EventTransitionAccumulator:
    """Incremental per-user transition counting, state relation-side."""

    _N_BUCKETS = 64

    def __init__(
        self,
        retention_batches: int | None = None,
        store_root: str | None = None,
        spark: SparkSession | None = None,
    ):
        self.retention_batches = retention_batches
        #: per-user last event as a DISTRIBUTED relation (never a dict)
        self.last_rel: DataFrame | None = None
        #: (from, to) → n — |event_types|²-bounded, hence driver-safe
        self.counts: dict[tuple[str, str], int] = defaultdict(int)
        self.n_batches = 0
        self.last_batch_id: int | None = None
        self._save_seq = 0
        self.store = None
        self._restored = True
        if store_root is not None:
            from flink_streaming_etl_spark.streaming.state_store import (
                AccumulatorStateStore,
            )

            self.store = AccumulatorStateStore(store_root)
            self._restored = False
            if spark is not None:
                self._restore(spark)

    # -- durability -------------------------------------------------------

    def _restore(self, spark: SparkSession) -> None:
        self._restored = True
        loaded = self.store.load(spark)
        if loaded is None:
            return
        bid, rels, extra = loaded
        self._save_seq = bid
        self.last_batch_id = extra.get("last_batch_id", bid)
        self.n_batches = int(extra.get("n_batches", 0))
        self.counts = defaultdict(int)
        for f, t, c in extra.get("counts", []):
            self.counts[(f, t)] = int(c)
        if "last" in rels:
            self.last_rel = rels["last"].localCheckpoint(eager=True)

    def _save(
        self,
        spark: SparkSession,
        last_bid: int | None,
        last_rel: DataFrame | None,
        counts: dict,
        n_batches: int,
        touched_users: DataFrame | None,
    ) -> None:
        if self.store is None:
            return
        from flink_streaming_etl_spark.streaming.state_store import (
            BucketedState,
        )

        seq = self._save_seq + 1
        self.store.save(
            seq,
            {},
            extra={
                "last_batch_id": last_bid,
                "n_batches": n_batches,
                "counts": [[f, t, int(c)] for (f, t), c in counts.items()],
            },
            bucketed={
                "last": BucketedState(
                    last_rel
                    if last_rel is not None
                    else spark.createDataFrame([], _LAST_SCHEMA),
                    ["user_id"],
                    n_buckets=self._N_BUCKETS,
                    touched=touched_users,
                )
            },
        )
        self._save_seq = seq

    # -- streaming side -----------------------------------------------------

    def add_batch(self, batch_events: DataFrame, batch_id: int | None = None) -> None:
        spark = batch_events.sparkSession
        if not self._restored:
            self._restore(spark)
        # replay guard CHECKED here, state/batch id COMMITTED at the end
        # (T6 fold-then-commit)
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return  # replay — already folded
        n = self.n_batches + 1
        width = int(spark.conf.get("spark.sql.shuffle.partitions"))

        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        base = batch_events.select("user_id", "ts", "event_id", "event_type")
        within = (
            base.withColumn("to_type", F.lead("event_type").over(w))
            .filter(F.col("to_type").isNotNull())
            .groupBy(F.col("event_type").alias("f"), F.col("to_type").alias("t"))
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()  # |event_types|²-bounded — O(results)
        )
        key = F.struct("ts", "event_id", "event_type")
        bounds = (
            base.groupBy("user_id")
            .agg(F.min(key).alias("first"), F.max(key).alias("last"))
            .localCheckpoint(eager=True)  # reused: boundary join + state fold
        )

        # boundary transitions — relation-side join of stored last events
        # with the batch's first events; only the (from, to) matrix
        # crosses to the driver
        boundary = []
        if self.last_rel is not None:
            boundary = (
                bounds.join(
                    self.last_rel.select(
                        "user_id", F.col("event_type").alias("_prev_type")
                    ),
                    "user_id",
                )
                .groupBy(
                    F.col("_prev_type").alias("f"),
                    F.col("first.event_type").alias("t"),
                )
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()  # |event_types|²-bounded — O(results)
            )

        # fold into LOCALS; self.* commits only after the durable save
        counts = defaultdict(int, self.counts)
        for r in within:
            counts[(r["f"], r["t"])] += r["n"]
        for r in boundary:
            counts[(r["f"], r["t"])] += r["n"]

        users_df = bounds.select("user_id")
        stamped = bounds.select(
            "user_id",
            F.col("last.ts").alias("ts"),
            F.col("last.event_id").alias("event_id"),
            F.col("last.event_type").alias("event_type"),
        ).withColumn("_last_fold", F.lit(n).cast("long"))
        if self.last_rel is not None:
            new_last = (
                self.last_rel.join(F.broadcast(users_df), "user_id", "anti")
                .unionByName(stamped)
            )
        else:
            new_last = stamped
        # idle retention (T5) decided relation-side
        if self.retention_batches is not None:
            horizon = n - self.retention_batches
            if horizon > 0:
                new_last = new_last.filter(F.col("_last_fold") > horizon)
        new_last = eager_checkpoint(new_last.coalesce(width))

        if self.store is not None and batch_id is not None:
            self._save(
                spark, batch_id, new_last, counts, n, touched_users=users_df
            )
        self.last_rel = new_last
        self.counts = counts
        self.n_batches = n
        if batch_id is not None:
            self.last_batch_id = int(batch_id)

    def attach(self, stream_events: DataFrame, **start_kwargs):
        return (
            stream_events.writeStream.outputMode("append")
            .foreachBatch(lambda batch, bid: self.add_batch(batch, bid))
            .start(**start_kwargs)
        )

    # -- query side ---------------------------------------------------------

    @property
    def last_event(self) -> dict:
        """Diagnostic/test accessor: {user_id: (ts, event_id, type)} —
        COLLECTS the state relation; never part of the fold path."""
        if self.last_rel is None:
            return {}
        return {
            r["user_id"]: (r["ts"], r["event_id"], r["event_type"])
            for r in self.last_rel.collect()
        }

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


# ---------------------------------------------------------------------------
# Native executor-resident state: the applyInPandasWithState twin (r12
# verdict task #6 — establish the idiomatic Spark stateful path).


#: GroupState layout: the user's last event (the exact tuple the
#: foreachBatch twin keeps per user in its state relation)
_GS_STATE = "us long, event_id long, event_type string"
#: emission: per-group (from, to) transition count deltas for the batch
_GS_OUTPUT = (
    "user_id long, from_type string, to_type string, n long"
)


def _transition_fold(key, pdf_iter, state):
    """Per-user GroupState fold: chain the stored last event to the
    batch's first, count within-batch transitions, store the new last.
    Pure pandas inside — executes ON THE EXECUTOR holding the group."""
    import pandas as pd

    rows = pd.concat(list(pdf_iter), ignore_index=True)
    rows = rows.sort_values(["us", "event_id"], kind="mergesort")
    types = rows["event_type"].tolist()
    out: dict[tuple[str, str], int] = {}
    if state.exists:
        prev_us, prev_eid, prev_type = state.get
        if types:
            out[(prev_type, types[0])] = out.get((prev_type, types[0]), 0) + 1
    for a, b in zip(types, types[1:]):
        out[(a, b)] = out.get((a, b), 0) + 1
    if len(rows):
        last = rows.iloc[-1]
        state.update((int(last["us"]), int(last["event_id"]),
                      str(last["event_type"])))
    (uid,) = key
    yield pd.DataFrame(
        [
            {"user_id": uid, "from_type": f, "to_type": t, "n": n}
            for (f, t), n in out.items()
        ],
        columns=["user_id", "from_type", "to_type", "n"],
    )


class StatefulEventTransitions:
    """``applyInPandasWithState`` twin of :class:`EventTransitionAccumulator`
    — per-user last-event state lives in Spark's GroupState on the
    executors (checkpointed by the engine, no accumulator relation),
    and the stream emits per-batch (from, to) count DELTAS which any
    additive downstream (here: a driver matrix fed via foreachBatch of
    the OUTPUT stream) folds. Equality with the foreachBatch twin is
    pinned in tests/test_round13.py."""

    def __init__(self):
        self.counts: dict[tuple[str, str], int] = defaultdict(int)

    def transform(self, stream_events: DataFrame) -> DataFrame:
        """The stateful transform: streaming events → per-batch per-user
        transition deltas (the stateful operator itself — composable
        with any downstream aggregation or sink)."""
        from pyspark.sql.streaming.state import GroupStateTimeout

        prepared = stream_events.select(
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "event_id",
            "event_type",
        )
        return prepared.groupBy("user_id").applyInPandasWithState(
            _transition_fold,
            outputStructType=_GS_OUTPUT,
            stateStructType=_GS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    def attach(self, stream_events: DataFrame, **start_kwargs):
        """Run the stateful transform and fold its delta stream into the
        driver matrix (the deltas are |types|²-bounded per batch)."""
        deltas = self.transform(stream_events)

        def _fold(batch: DataFrame, bid: int) -> None:
            for r in (
                batch.groupBy("from_type", "to_type")
                .agg(F.sum("n").alias("n"))
                .collect()
            ):
                self.counts[(r["from_type"], r["to_type"])] += int(r["n"])

        return (
            deltas.writeStream.outputMode("append")
            .foreachBatch(_fold)
            .start(**start_kwargs)
        )

    def result(self, spark: SparkSession) -> DataFrame:
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
