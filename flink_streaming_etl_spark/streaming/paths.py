"""Streaming session-path analysis: the path-frequency head of
:func:`~flink_streaming_etl_spark.operators.analytics.top_event_paths`
maintained across micro-batches — the third member of the behavioral
streaming trio (transitions.py gives the Markov edges, windows.py the
session envelopes, this the full-path distribution).

Per micro-batch the HEAVY work stays distributed: one batch-sized Spark
job sessionizes the batch with the SAME lag+running-sum recipe as the
batch operator and folds each within-batch session to (ordered type
list capped at max_steps, first/last event micro-times) — the collect
is bounded by the batch's session count, never corpus lifetime. The
driver stitches batch boundaries: a user's stored OPEN session absorbs
their first batch session when the gap is within the session threshold
(paths concatenate, still capped), every non-final session closes into
an additive path→count map, and the user's last session stays open.
State is O(active users) open-session tuples + the path-frequency map
(bounded by the observed path-head, itself ≤ |types|^max_steps).

Ordering contract: per-user batch-monotone delivery (the PK-keyed Kafka
guarantee, S6); within a batch any order (the window sorts). Replays
are idempotent by batch id. Idle retention (T5): users idle for
``retention_batches`` have their open session CLOSED into the counts
and their state evicted — exactly what a session timeout means, so
eviction here is semantics, not approximation, provided the retention
horizon ≥ the session gap in batch time.

Equality pin (tests/test_round10.py): fed any batch-monotone split,
``result()`` (closed + still-open paths) equals the batch operator's
full-table path frequencies.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_etl_spark.operators.analytics import (
    PATH_GAP_MINUTES,
    PATH_MAX_STEPS,
)


class EventPathAccumulator:
    """Incremental gap-session path counting with bounded state."""

    def __init__(
        self,
        gap_minutes: int = PATH_GAP_MINUTES,
        max_steps: int = PATH_MAX_STEPS,
        retention_batches: int | None = None,
    ):
        self.gap_us = gap_minutes * 60 * 1_000_000
        self.max_steps = max_steps
        self.retention_batches = retention_batches
        #: user_id -> (types tuple ≤ max_steps, last event us) of the OPEN session
        self.open: dict = {}
        self.last_active: dict = {}
        self.counts: dict[str, int] = defaultdict(int)
        self.n_batches = 0
        self.last_batch_id: int | None = None

    # -- streaming side -----------------------------------------------------

    def add_batch(self, batch_events: DataFrame, batch_id: int | None = None) -> None:
        # Transactional fold ordering (T6, the streaming/cep.py
        # discipline): replay guard CHECKED here, all state and the batch
        # id COMMITTED only after the whole fold succeeds — a mid-fold
        # failure (e.g. in the sessionize job) retried under the same
        # epoch id re-folds cleanly instead of being skipped as a replay.
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return  # replay of a COMMITTED batch — already folded
        n_batches = self.n_batches + 1

        us = F.unix_micros(F.col("ts").cast("timestamp"))
        w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
        prev_us = F.lag(us).over(w)
        is_new = F.when(
            prev_us.isNull() | ((us - prev_us) > self.gap_us), 1
        ).otherwise(0)
        sessions = (
            batch_events.withColumn(
                "session_idx",
                F.sum(is_new).over(
                    w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
                ),
            )
            .groupBy("user_id", "session_idx")
            .agg(
                F.transform(
                    F.sort_array(
                        F.collect_list(
                            F.struct(
                                us.alias("us"),
                                F.col("event_id").alias("eid"),
                                F.col("event_type").alias("t"),
                            )
                        )
                    ),
                    lambda s: s["t"],
                ).alias("types"),
                F.min(us).alias("first_us"),
                F.max(us).alias("last_us"),
            )
            .collect()  # bounded by the batch's session count
        )

        # fold into LOCAL copies; self.* commits only at the end
        open_ = dict(self.open)
        counts = defaultdict(int, self.counts)
        last_active = dict(self.last_active)
        by_user: dict = defaultdict(list)
        for r in sessions:
            by_user[r["user_id"]].append(r)
        for uid, sess in by_user.items():
            sess.sort(key=lambda r: r["session_idx"])
            prev = open_.pop(uid, None)
            if prev is not None:
                types, last_us = prev
                first = sess[0]
                if first["first_us"] - last_us <= self.gap_us:
                    # stitch: the stored open session continues
                    merged = (list(types) + list(first["types"]))[: self.max_steps]
                    sess[0] = {
                        "types": merged,
                        "last_us": first["last_us"],
                    }
                else:
                    counts[">".join(types)] += 1
            # every non-final batch session is closed by construction
            for r in sess[:-1]:
                counts[">".join(list(r["types"])[: self.max_steps])] += 1
            last = sess[-1]
            open_[uid] = (
                tuple(list(last["types"])[: self.max_steps]),
                last["last_us"],
            )
            last_active[uid] = n_batches
        self._evict(open_, counts, last_active, n_batches)
        # fold succeeded — commit memory + batch id
        self.open = open_
        self.counts = counts
        self.last_active = last_active
        self.n_batches = n_batches
        if batch_id is not None:
            self.last_batch_id = int(batch_id)

    def _evict(self, open_: dict, counts: dict, last_active: dict, n_batches: int) -> None:
        if self.retention_batches is None:
            return
        horizon = n_batches - self.retention_batches
        if horizon <= 0:
            return
        for uid in [u for u, b in last_active.items() if b <= horizon]:
            del last_active[uid]
            types, _ = open_.pop(uid)
            # a session timeout CLOSES the session — semantics, not loss
            counts[">".join(types)] += 1

    # -- query side -----------------------------------------------------------

    def result(self, spark: SparkSession, include_open: bool = True) -> DataFrame:
        """Path frequencies (path, n_sessions); ``include_open`` folds the
        still-open sessions in, matching the batch operator on a full
        replay (the batch view has no notion of 'open')."""
        total: dict[str, int] = defaultdict(int, self.counts)
        if include_open:
            for types, _ in self.open.values():
                total[">".join(types)] += 1
        rows = [(p, n) for p, n in total.items()]
        return spark.createDataFrame(rows, "path string, n_sessions long")
