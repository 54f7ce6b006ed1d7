"""Streaming data-quality gate: the constraint battery of
:func:`~flink_streaming_etl_spark.operators.analytics.data_quality_report`
maintained across micro-batches of an append stream — violations are
found the batch they arrive, not at the next full-table audit.

Per micro-batch ALL heavy work stays distributed and the driver receives
only O(1) rows (scalar aggregates):

- the additive checks (completeness, domain, range, non-positive) fold
  through one batch-sized agg → a single ``first()`` row of counters;
- the referential check anti-joins the batch against the dimension key
  relation (the TtlDimensionCache contract: broadcast-sized, built once
  from ``dim_keys``) → one ``count()`` scalar;
- cross-batch KEY UNIQUENESS — the one check that is NOT additive —
  keeps the seen-key state as a DISTRIBUTED relation
  (localCheckpoint'd each batch, exactly the ±delta accumulators'
  state discipline in ``streaming/incremental.py``): the batch's
  per-key counts left-join the seen relation and one SUM scalar yields
  the batch's duplicate count; the seen relation then absorbs the
  batch's keys via a shuffle-free append. Since round 12 the durable
  save is also incremental: the relation is bucket-partitioned and a
  batch rewrites only the buckets its NEW keys hash into
  (``state_store.py`` BucketedState); driver memory is O(1) regardless
  of corpus volume — the round-10 unbounded driver seen-set is gone.

NULL-key semantics match the batch operator exactly (ADVICE r10): the
batch computes ``n_rows − count_distinct(o_orderkey)`` and
``count_distinct`` ignores NULL, so EVERY NULL-keyed row is a
uniqueness violation. Here NULL-keyed rows are counted wholesale from
the additive agg and never enter the seen relation.

Equality pin (tests/test_round10.py, test_round11.py): after any batch
split of the orders table, ``result()`` equals the batch operator on
the replayed union — including NULL keys and cross-batch duplicates.
Replays are idempotent by batch id.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_etl_spark.operators.analytics import DQ_ALLOWED_STATUS


class DataQualityAccumulator:
    """Incremental constraint-violation counting over an append stream."""

    CHECKS = (
        "orderkey_unique",
        "custkey_complete",
        "custkey_references_customer",
        "totalprice_positive",
        "orderdate_in_range",
        "status_in_domain",
    )

    def __init__(
        self,
        dim_keys: set | None = None,
        state_dir: str | None = None,
        state_buckets: int = 64,
    ):
        #: bucket count for the durable seen-key relation — corpus-scale,
        #: saved incrementally (files rewritten ∝ buckets the batch's NEW
        #: keys hash into; state_store.py)
        self.state_buckets = int(state_buckets)
        #: customer key set for the referential check (broadcast-sized,
        #: the TTL dimension cache contract; None disables the check)
        self.dim_keys = dim_keys
        self._dim_df: DataFrame | None = None  # built lazily, once
        self.n_rows = 0
        self.violations: dict[str, int] = defaultdict(int)
        #: distinct non-null o_orderkey values seen so far — a DISTRIBUTED
        #: relation, never collected to the driver
        self._seen: DataFrame | None = None
        self.last_batch_id: int | None = None
        #: durable state (streaming/state_store.py): the seen-key relation
        #: plus the scalar counters, saved per folded batch — required
        #: when the gate runs under a persistent streaming checkpoint (T6)
        self._store = None
        if state_dir is not None:
            from flink_streaming_etl_spark.streaming.state_store import (
                AccumulatorStateStore,
            )

            self._store = AccumulatorStateStore(state_dir)

    def restore(self, spark: SparkSession) -> bool:
        """Load the last saved state (True if something was restored)."""
        if self._store is None:
            return False
        loaded = self._store.load(spark)
        if loaded is None:
            return False
        self.last_batch_id, rels, extra = loaded
        self._seen = rels.get("seen")
        self.n_rows = int(extra.get("n_rows", 0))
        self.violations = defaultdict(int, {
            k: int(v) for k, v in extra.get("violations", {}).items()
        })
        return True

    def add_batch(self, batch_orders: DataFrame, batch_id: int | None = None) -> None:
        # Transactional fold ordering (T6, the streaming/cep.py
        # discipline): replay guard CHECKED here, counters/state/batch id
        # COMMITTED only after the fold and the durable save succeed — a
        # mid-fold failure retried under the same epoch id re-folds
        # cleanly instead of being misclassified as a replay.
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return  # replay of a COMMITTED batch — already folded

        agg = batch_orders.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("o_custkey").isNull(), 1).otherwise(0)).alias("v_null"),
            F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("v_pos"),
            F.sum(
                F.when(
                    (F.col("o_orderdate") < F.lit("1992-01-01"))
                    | (F.col("o_orderdate") >= F.lit("2005-01-01")),
                    1,
                ).otherwise(0)
            ).alias("v_date"),
            F.sum(
                F.when(~F.col("o_orderstatus").isin(*DQ_ALLOWED_STATUS), 1).otherwise(0)
            ).alias("v_status"),
            # NULL-keyed rows: all of them are uniqueness violations
            # (count_distinct ignores NULL in the batch operator)
            F.sum(F.when(F.col("o_orderkey").isNull(), 1).otherwise(0)).alias("v_keynull"),
        ).first()
        z = lambda v: 0 if v is None else int(v)  # noqa: E731
        # fold into LOCALS; self.* commits only after the durable save
        new_n_rows = self.n_rows + z(agg["n"])
        viol = defaultdict(int, self.violations)
        viol["custkey_complete"] += z(agg["v_null"])
        viol["totalprice_positive"] += z(agg["v_pos"])
        viol["orderdate_in_range"] += z(agg["v_date"])
        viol["status_in_domain"] += z(agg["v_status"])

        if self.dim_keys is not None:
            if self._dim_df is None:
                spark = batch_orders.sparkSession
                self._dim_df = spark.createDataFrame(
                    [(k,) for k in sorted(self.dim_keys)], "o_custkey long"
                ).localCheckpoint(eager=True)
            orphans = (
                batch_orders.filter(F.col("o_custkey").isNotNull())
                .join(F.broadcast(self._dim_df), "o_custkey", "left_anti")
                .count()  # one scalar to the driver
            )
            viol["custkey_references_customer"] += int(orphans)

        # cross-batch uniqueness: per-key counts of THIS batch left-join
        # the distributed seen relation; for a key already seen all n
        # occurrences are duplicates, for a new key n − 1 are. One SUM
        # scalar crosses to the driver; the key relation never does.
        bk = (
            batch_orders.filter(F.col("o_orderkey").isNotNull())
            .groupBy("o_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
            .localCheckpoint(eager=True)  # reused: dup scalar + seen fold
        )
        if self._seen is None:
            dup_row = bk.agg(F.sum(F.col("n") - 1).alias("d")).first()
            new_seen = bk.select("o_orderkey")
            touched_keys = new_seen
        else:
            marked = bk.join(
                self._seen.withColumn("_seen", F.lit(1)), "o_orderkey", "left"
            ).localCheckpoint(eager=True)  # batch-bounded; reused twice
            dup_row = marked.agg(
                F.sum(
                    F.col("n")
                    - 1
                    + F.when(F.col("_seen").isNotNull(), 1).otherwise(0)
                ).alias("d")
            ).first()
            # the SAME marked relation names the batch's genuinely new
            # keys, so the seen state grows by a shuffle-free append —
            # never a union().distinct() re-shuffle of the whole state
            # (the r11 first cut paid that; at 100 TB the per-batch cost
            # must be the join probe, not a state-wide repartition)
            new_keys = marked.filter(F.col("_seen").isNull()).select("o_orderkey")
            new_seen = self._seen.union(new_keys)
            touched_keys = new_keys
        viol["orderkey_unique"] += z(dup_row["d"]) + z(agg["v_keynull"])
        # localCheckpoint truncates lineage so state cost stays ∝ |state|;
        # coalesce bounds the partition count (the shuffle-free append
        # adds the batch's partitions every fold — without a narrow
        # coalesce the task count grows linearly with folds)
        width = int(
            batch_orders.sparkSession.conf.get("spark.sql.shuffle.partitions")
        )
        new_seen = new_seen.coalesce(width).localCheckpoint(eager=True)
        if self._store is not None and batch_id is not None:
            from flink_streaming_etl_spark.streaming.state_store import (
                BucketedState,
            )

            # corpus-scale relation, incremental save: a batch rewrites
            # only the buckets its NEW keys hash into (existing keys
            # don't change the relation, so their buckets are untouched)
            self._store.save(
                batch_id,
                {},
                extra={"n_rows": new_n_rows,
                       "violations": dict(viol)},
                bucketed={
                    "seen": BucketedState(
                        new_seen,
                        key_cols=["o_orderkey"],
                        n_buckets=self.state_buckets,
                        touched=touched_keys,
                    )
                },
            )
        # durable save succeeded — commit memory + batch id
        self.n_rows = new_n_rows
        self.violations = viol
        self._seen = new_seen
        if batch_id is not None:
            self.last_batch_id = int(batch_id)

    def attach(self, stream_orders: DataFrame, checkpoint_root: str | None = None,
               **start_kwargs):
        """Wire onto a streaming orders DataFrame via foreachBatch."""
        w = stream_orders.writeStream.outputMode("append").foreachBatch(
            lambda batch, bid: self.add_batch(batch, int(bid))
        )
        if checkpoint_root is not None:
            w = w.option("checkpointLocation", checkpoint_root)
        return w.trigger(availableNow=True).start(**start_kwargs)

    def result(self, spark: SparkSession) -> DataFrame:
        rows = [
            (
                c,
                self.n_rows,
                self.violations.get(c, 0),
                self.violations.get(c, 0) == 0,
            )
            for c in self.CHECKS
            if not (c == "custkey_references_customer" and self.dim_keys is None)
        ]
        return spark.createDataFrame(
            rows, "check_name string, n_checked long, n_violations long, passed boolean"
        )
