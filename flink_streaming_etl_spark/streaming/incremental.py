"""Incremental maintenance of decomposable aggregates over a changelog.

The materialize-then-recompute loop (pipeline.py) recomputes downstream
aggregates from the full state each micro-batch — always correct, but the
per-batch cost grows with state size. For SUM/COUNT-style decomposable
aggregates there is a cheaper exact path, the ±delta form of Flink's
retract-stream aggregation (SURVEY.md §2.3 A3):

    op c/r  →  +after        op d  →  -before        op u  →  -before +after

Each micro-batch shuffles ONLY its own deltas (grouped to one row per
touched key) and merges them into the aggregate state with a keyed outer
join — per-batch cost proportional to batch size, not state size. At 100 TB
of accumulated state this is the difference between a bounded streaming job
and an unbounded recompute.

Contract: requires per-key exactly-once, in-order delivery with faithful
before-images — exactly what Debezium provides when topics are keyed by
primary key (S6; the Kafka message key IS the PK struct). Under
at-least-once redelivery use the recompute loop instead (its merge is
idempotent); tests/test_incremental.py proves delta ≡ recompute on the
reference's cancellable-orders scenario.

Money sums accumulate in DECIMAL so +x followed by -x cancels exactly
(float deltas would drift); counts are exact longs that reach 0 and drop
the key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def changelog_deltas(chunk: DataFrame, predicate: Callable[[Column], Column] | None) -> DataFrame:
    """Envelopes → signed row images: (+1 after) for c/r, (-1 before) for d,
    both for u. ``predicate`` (e.g. status <> 'closed') applies to each
    image independently — an update into the filtered-out region emits only
    its retraction, exactly like a retract stream crossing a filter."""
    signed = chunk.select(
        F.explode(
            F.array(
                F.struct(F.col("before").alias("img"), F.lit(-1).alias("sign")),
                F.struct(F.col("after").alias("img"), F.lit(1).alias("sign")),
            )
        ).alias("e"),
        "op",
    ).select(F.col("e.img").alias("img"), F.col("e.sign").alias("sign"), "op")
    keep = (
        ((F.col("op").isin("c", "r")) & (F.col("sign") == 1))
        | ((F.col("op") == "d") & (F.col("sign") == -1))
        | (F.col("op") == "u")
    )
    out = signed.filter(keep & F.col("img").isNotNull())
    if predicate is not None:
        out = out.filter(predicate(F.col("img")))
    return out


class IncrementalSumCount:
    """Exact incremental SUM(amount)/COUNT(*) GROUP BY key_exprs over a
    changelog — the delta-maintained twin of a recompute aggregate.

    ``key_exprs`` maps an image struct column to the grouping columns;
    ``amount`` extracts the summed measure. State is a small keyed table
    (one row per live group), merged per batch."""

    def __init__(
        self,
        key_exprs: Callable[[Column], list[Column]],
        amount: Callable[[Column], Column],
        predicate: Callable[[Column], Column] | None = None,
    ):
        self.key_exprs = key_exprs
        self.amount = amount
        self.predicate = predicate
        self.state: DataFrame | None = None

    def apply(self, chunk: DataFrame) -> DataFrame:
        img = F.col("img")
        deltas = changelog_deltas(chunk, self.predicate)
        keys = self.key_exprs(img)
        key_names = [f"k{i}" for i in range(len(keys))]
        batch = (
            deltas.select(
                *[k.alias(n) for k, n in zip(keys, key_names)],
                (F.col("sign").cast(DEC) * self.amount(img).cast(DEC)).alias("_amt"),
                F.col("sign").cast("long").alias("_cnt"),
            )
            .groupBy(*key_names)
            .agg(F.sum("_amt").alias("d_amount"), F.sum("_cnt").alias("d_cnt"))
        )
        if self.state is None:
            merged = batch.select(
                *key_names,
                F.col("d_amount").alias("amount"),
                F.col("d_cnt").alias("cnt"),
            )
        else:
            zero_amt = F.lit(0).cast(DEC)
            merged = (
                self.state.join(batch, on=key_names, how="full_outer")
                .select(
                    *key_names,
                    (F.coalesce(F.col("amount"), zero_amt)
                     + F.coalesce(F.col("d_amount"), zero_amt)).alias("amount"),
                    (F.coalesce(F.col("cnt"), F.lit(0))
                     + F.coalesce(F.col("d_cnt"), F.lit(0))).alias("cnt"),
                )
            )
        merged = merged.filter(F.col("cnt") > 0)
        # Cut lineage: state is the running accumulator across batches.
        self.state = merged.localCheckpoint(eager=True)
        return self.state

    def result(self) -> DataFrame | None:
        return self.state


class IncrementalDistinctCount:
    """Exact incremental COUNT(DISTINCT value) GROUP BY key over a
    changelog — the retraction aggregate Flink singles out as the hard
    case (a plain count can fold ±1s; a DISTINCT count changes only when
    a value's multiplicity crosses 0, so the operator must keep per-
    (group, value) reference counts as state — Flink's
    DistinctAccumulator does exactly this map).

    Two-tier state, both relations keyed for cluster partitioning:

    - ``ref_state`` (group, value, cnt>0): the reference counts. Per
      batch, only the batch's own (group, value) deltas shuffle (one
      row per touched pair after a map-side combine), then a keyed
      outer-join merge — cost ∝ batch, never state.
    - ``count_state`` (group, distinct_cnt): maintained from the SIGNED
      CROSSINGS the merge emits (+1 when a pair's cnt goes 0→positive,
      −1 when positive→0). The distinct count is a plain SUM of
      crossings, so the second tier is an ordinary IncrementalSumCount-
      style fold — bounded by touched pairs too.

    Same delivery contract as the siblings (per-key exactly-once with
    faithful before-images); replay-idempotent via batch ids; pinned
    equal to a full recompute after every changelog prefix in
    tests/test_round10.py.
    """

    def __init__(
        self,
        key_exprs: Callable[[Column], list[Column]],
        value: Callable[[Column], Column],
        predicate: Callable[[Column], Column] | None = None,
        state_dir: str | None = None,
        state_buckets: int = 16,
        retention_batches: int | None = None,
    ):
        self.key_exprs = key_exprs
        self.value = value
        self.predicate = predicate
        #: idle-state retention (T5, streaming/retention.py): groups
        #: untouched for this many batches drop their ref-counts and
        #: distinct count together (Flink TTL semantics — a reappearing
        #: group starts fresh). Built lazily (key arity is known at the
        #: first apply).
        self.retention_batches = retention_batches
        self._retention = None
        #: bucket count for the durable ref_state relation — the one
        #: state tier that grows with the corpus, saved incrementally
        #: (files rewritten ∝ buckets the batch touched; state_store.py)
        self.state_buckets = int(state_buckets)
        #: (k0..kn, v, cnt) reference counts, cnt > 0
        self.ref_state: DataFrame | None = None
        #: (k0..kn, distinct_cnt), distinct_cnt > 0
        self.count_state: DataFrame | None = None
        self.last_batch_id: int | None = None
        #: durable state (see streaming/state_store.py) — required when
        #: attach() uses a persistent checkpointLocation
        self._store = None
        if state_dir is not None:
            from flink_streaming_etl_spark.streaming.state_store import (
                AccumulatorStateStore,
            )

            self._store = AccumulatorStateStore(state_dir)

    def restore(self, spark) -> bool:
        """Load the last saved state (True if something was restored)."""
        if self._store is None:
            return False
        loaded = self._store.load(spark)
        if loaded is None:
            return False
        self.last_batch_id, rels, extra = loaded
        self.ref_state = rels.get("ref_state")
        self.count_state = rels.get("count_state")
        if self.retention_batches is not None and "retention_touch" in rels:
            from flink_streaming_etl_spark.streaming.retention import (
                GroupRetention,
            )

            touch = rels["retention_touch"]
            key_names = [c for c in touch.columns if c != "_last_batch"]
            self._retention = GroupRetention(key_names, self.retention_batches)
            self._retention.restore(rels, extra)
        return True

    def apply(self, chunk: DataFrame, batch_id: int | None = None) -> DataFrame | None:
        # Transactional fold ordering (T6, the streaming/cep.py
        # discipline): the replay guard is CHECKED here, but the batch id
        # and the state references are COMMITTED only after the fold and
        # the durable save succeed — a batch that fails mid-fold and is
        # retried under the same epoch id re-folds cleanly instead of
        # being misclassified as an already-seen replay. The retention
        # clock is the one best-effort exception (a retried batch may
        # tick it twice, shortening an idle key's grace by one fold).
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return None

        img = F.col("img")
        deltas = changelog_deltas(chunk, self.predicate)
        keys = self.key_exprs(img)
        key_names = [f"k{i}" for i in range(len(keys))]
        pair_names = [*key_names, "v"]
        batch = (
            deltas.select(
                *[k.alias(n) for k, n in zip(keys, key_names)],
                self.value(img).alias("v"),
                F.col("sign").cast("long").alias("_d"),
            )
            # COUNT(DISTINCT) ignores NULL values; so must the ref tier
            .filter(F.col("v").isNotNull())
            .groupBy(*pair_names)
            .agg(F.sum("_d").alias("d_cnt"))
            .filter(F.col("d_cnt") != 0)
            # batch-bounded; materialized once, reused by the merge, the
            # crossings AND the touched-bucket save below
            .localCheckpoint(eager=True)
        )

        # merge into reference counts, emitting the 0-crossings
        if self.ref_state is None:
            merged = batch.select(*pair_names, F.col("d_cnt").alias("cnt"))
            old_cnt = F.lit(0)
        else:
            merged = (
                self.ref_state.withColumnRenamed("cnt", "_old")
                .join(batch, on=pair_names, how="full_outer")
                .select(
                    *pair_names,
                    F.coalesce(F.col("_old"), F.lit(0)).alias("_old"),
                    (
                        F.coalesce(F.col("_old"), F.lit(0))
                        + F.coalesce(F.col("d_cnt"), F.lit(0))
                    ).alias("cnt"),
                )
            )
            old_cnt = F.col("_old")
        crossings = (
            merged.select(
                *key_names,
                (
                    F.when((old_cnt <= 0) & (F.col("cnt") > 0), 1)
                    .when((old_cnt > 0) & (F.col("cnt") <= 0), -1)
                    .otherwise(0)
                ).alias("_x"),
            )
            .groupBy(*key_names)
            .agg(F.sum("_x").alias("d_distinct"))
            .filter(F.col("d_distinct") != 0)
        )
        new_ref = (
            merged.filter(F.col("cnt") > 0)
            .select(*pair_names, "cnt")
            .localCheckpoint(eager=True)
        )

        # fold crossings into the per-group distinct count
        if self.count_state is None:
            counts = crossings.select(
                *key_names, F.col("d_distinct").alias("distinct_cnt")
            )
        else:
            counts = (
                self.count_state.join(crossings, on=key_names, how="full_outer")
                .select(
                    *key_names,
                    (
                        F.coalesce(F.col("distinct_cnt"), F.lit(0))
                        + F.coalesce(F.col("d_distinct"), F.lit(0))
                    ).alias("distinct_cnt"),
                )
            )
        new_count = (
            counts.filter(F.col("distinct_cnt") > 0).localCheckpoint(eager=True)
        )
        evicted_pairs = None
        if self.retention_batches is not None:
            from flink_streaming_etl_spark.streaming.retention import (
                GroupRetention,
                evict,
            )

            if self._retention is None:
                self._retention = GroupRetention(key_names, self.retention_batches)
            idle = self._retention.tick(batch.select(*key_names).distinct())
            if idle is not None:
                # the evicted pairs live in buckets this batch may NOT
                # have touched — capture them BEFORE eviction so the
                # durable save below rewrites their buckets too (else a
                # restore would resurrect evicted state from stale
                # bucket files)
                from flink_streaming_etl_spark.streaming.retention import (
                    group_match,
                )

                evicted_pairs = (
                    new_ref.join(
                        F.broadcast(idle),
                        group_match(new_ref, idle, key_names),
                        "semi",
                    )
                    .select(*pair_names)
                    .localCheckpoint(eager=True)
                )
                new_ref = evict(new_ref, idle, key_names)
                new_count = evict(new_count, idle, key_names)
        if self._store is not None and batch_id is not None:
            from flink_streaming_etl_spark.streaming.state_store import (
                BucketedState,
            )

            # count_state is group-bounded (small) — plain full rewrite;
            # ref_state grows with the corpus — save only the buckets
            # this batch's pairs hash into (state_store.py)
            rels = {"count_state": new_count}
            extra = None
            if self._retention is not None:
                rels.update(self._retention.relations())
                extra = self._retention.extra()
            self._store.save(
                batch_id,
                rels,
                extra=extra,
                bucketed={
                    "ref_state": BucketedState(
                        new_ref,
                        key_cols=pair_names,
                        n_buckets=self.state_buckets,
                        touched=(
                            batch.select(*pair_names)
                            if evicted_pairs is None
                            else batch.select(*pair_names).unionByName(
                                evicted_pairs
                            )
                        ),
                    )
                },
            )
        # durable save succeeded — commit memory + batch id (fold-then-commit)
        self.ref_state = new_ref
        self.count_state = new_count
        if batch_id is not None:
            self.last_batch_id = int(batch_id)
        return new_count

    def attach(self, stream: DataFrame, checkpoint_root: str | None = None, **kw):
        """Run this accumulator over a changelog stream (see
        attach_changelog_stream)."""
        return attach_changelog_stream(self, stream, checkpoint_root, **kw)

    def result(self) -> DataFrame | None:
        return self.count_state

    def recompute(self) -> DataFrame | None:
        """COUNT(DISTINCT) over the reference counts — the always-correct
        twin for the equality pin (ref_state is itself delta-maintained,
        so the pin also exercises the first tier)."""
        if self.ref_state is None:
            return None
        key_names = [c for c in self.ref_state.columns if c.startswith("k")]
        return self.ref_state.groupBy(*key_names).agg(
            F.count_distinct(F.col("v")).alias("distinct_cnt")
        )


def attach_changelog_stream(acc, stream: DataFrame, checkpoint_root: str | None = None, **start_kwargs):
    """Wire ONE changelog stream into an accumulator exposing
    ``apply(chunk, batch_id)`` via foreachBatch and start it
    (availableNow). foreachBatch is at-least-once, so the accumulator's
    own batch-id guard makes restart replays no-ops (T6) — same
    discipline as IncrementalJoin.attach, minus the two-sided lock (one
    stream, one writer)."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        acc.apply(batch_df, batch_id=int(batch_id))

    w = stream.writeStream.foreachBatch(process)
    if checkpoint_root is not None:
        w = w.option("checkpointLocation", checkpoint_root)
    return w.trigger(availableNow=True).start(**start_kwargs)
