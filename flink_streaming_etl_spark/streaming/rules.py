"""The Broadcast State Pattern — Flink's canonical two-stream shape
(Flink docs "The Broadcast State Pattern"; the fraud-detection
dynamic-rules example): a LOW-VOLUME rules changelog updates state that
is broadcast to every parallel instance, and the HIGH-VOLUME event
stream is evaluated against the CURRENT rules without restarting the
job.

Spark-first shape:

* rule state is a latest-state relation maintained per rules
  micro-batch with the same upsert/delete merge discipline as the CDC
  core (new chunk wins per rule_id, deletes drop the rule) —
  localCheckpoint'd, and durable through
  :class:`~flink_streaming_etl_spark.streaming.state_store.
  AccumulatorStateStore`;
* evaluation is ONE broadcast hash join per event micro-batch
  (plan-pinned): Flink's broadcast state literally means "the whole
  rule set on every instance", which is exactly Spark's broadcast-join
  contract, so the rule relation must stay broadcast-sized — the same
  contract the TTL dimension cache (S3) documents;
* semantics are processing-time, as in Flink: an event batch sees every
  rule batch folded BEFORE it, nothing after — deterministic for any
  given interleaving (pinned by a scripted test and a random-interleaving
  model test).

Replays are idempotent per stream (independent batch-id guards for the
rules and events sides — T6); a replayed event batch returns no hits
rather than double-emitting.
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
from pyspark.sql.window import Window

from flink_streaming_etl_spark.streaming.state_store import AccumulatorStateStore

RULE_SCHEMA = StructType(
    [
        StructField("op", StringType()),  # 'u' upsert | 'd' delete
        StructField("rule_id", LongType()),
        StructField("event_type", StringType()),
        StructField("min_value", DoubleType()),
    ]
)

_STATE_COLS = ["rule_id", "event_type", "min_value"]


def evaluate_rules(events: DataFrame, rules: DataFrame) -> DataFrame:
    """Hits of a rule relation against events: ONE broadcast hash join
    on event_type + the value threshold (the evaluation kernel shared
    by :class:`BroadcastRuleEngine` and the batch registry entry)."""
    return (
        events.join(
            F.broadcast(rules),
            (events["event_type"] == rules["event_type"])
            & (events["value"] >= rules["min_value"]),
        )
        .select(
            "rule_id",
            "event_id",
            "user_id",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
            "value",
        )
    )


class BroadcastRuleEngine:
    """Dynamic-rule evaluation with broadcast rule state."""

    def __init__(
        self,
        store_root: str | None = None,
        spark: SparkSession | None = None,
    ):
        self.rules: DataFrame | None = None
        self.last_rules_batch_id: int | None = None
        self.last_events_batch_id: int | None = None
        #: monotone save sequence — the store's version id must STRICTLY
        #: increase per save (its write protocol never overwrites a live
        #: b<id> directory), so the two streams' batch ids cannot serve
        #: as version ids (they interleave and repeat across streams)
        self._save_seq = 0
        self.store = AccumulatorStateStore(store_root) if store_root else None
        self._restored = self.store is None
        if self.store is not None and spark is not None:
            self._restore(spark)

    # -- durability ------------------------------------------------------

    def _restore(self, spark: SparkSession) -> None:
        self._restored = True
        loaded = self.store.load(spark)
        if loaded is None:
            return
        bid, rels, extra = loaded
        self.rules = rels.get("rules")
        self.last_rules_batch_id = extra.get("rules_bid")
        self.last_events_batch_id = extra.get("events_bid")
        self._save_seq = bid

    def _persist(
        self,
        spark: SparkSession,
        rules: DataFrame | None,
        rules_bid: int | None,
        events_bid: int | None,
    ) -> None:
        """Save a CANDIDATE state (not yet committed to self) under a
        fresh version id — the caller commits in-memory state only after
        this returns (fold → save → commit, the T6 retry contract)."""
        if self.store is None:
            return
        self._save_seq += 1
        self.store.save(
            self._save_seq,
            {"rules": rules},
            extra={"rules_bid": rules_bid, "events_bid": events_bid},
        )

    # -- rules side ------------------------------------------------------

    def add_rules_batch(
        self,
        rules_changelog: DataFrame,
        batch_id: int | None = None,
        seq_col: str | None = None,
    ) -> None:
        """Fold one rules micro-batch: last op per rule_id wins within
        the batch ('u' upserts, 'd' deletes), then the chunk merges over
        the current state.

        ``seq_col`` (r12 verdict #8) names a REAL per-record sequence
        column carried by the source — Kafka offset, Debezium
        ``ts_ms``+``pos``, a CDC LSN — and makes "last op wins"
        layout-independent: ties resolve by the highest ``seq_col``
        value per rule_id regardless of how the batch's partitions are
        laid out. The column is consumed here (not part of rule state).

        Without it, the fallback ordering is the sources/cdc.py
        ``_seq`` trade, not a guarantee: ``monotonically_increasing_id``
        is PARTITION-LOCAL, so a single-partition rules changelog (file
        fixtures, or one Kafka partition — the reference keys control
        topics by rule id, so per-key order holds) resolves in arrival
        order, while a multi-partition batch where the same rule_id
        lands in different partitions resolves in partition-layout
        order instead."""
        spark = rules_changelog.sparkSession
        if not self._restored:
            self._restore(spark)
        if (
            batch_id is not None
            and self.last_rules_batch_id is not None
            and batch_id <= self.last_rules_batch_id
        ):
            return
        if seq_col is not None:
            chunk = rules_changelog.withColumn("_seq", F.col(seq_col))
        else:
            chunk = rules_changelog.withColumn(
                "_seq", F.monotonically_increasing_id()
            )
        w = Window.partitionBy("rule_id").orderBy(F.col("_seq").desc())
        last = (
            chunk.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("op", *_STATE_COLS)
        )
        if self.rules is not None:
            # null-safe anti join: a NULL rule_id is a real key and must
            # be replaceable/deletable like any other (the _nsj
            # discipline from operators/cep.py)
            from flink_streaming_etl_spark.operators.cep import _nsj

            keep = _nsj(
                self.rules, last.select("rule_id"), ["rule_id"], how="left_anti"
            )
            merged = keep.unionByName(
                last.filter(F.col("op") == "u").select(*_STATE_COLS)
            )
        else:
            merged = last.filter(F.col("op") == "u").select(*_STATE_COLS)
        merged = merged.localCheckpoint(eager=True)
        bid = int(batch_id) if batch_id is not None else self.last_rules_batch_id
        if batch_id is not None:
            self._persist(spark, merged, bid, self.last_events_batch_id)
        # commit only after the durable save succeeded
        self.rules = merged
        if batch_id is not None:
            self.last_rules_batch_id = bid

    # -- events side -----------------------------------------------------

    def evaluate(self, events: DataFrame) -> DataFrame:
        """Hits of the CURRENT rules against an event relation."""
        spark = events.sparkSession
        rules = self.rules
        if rules is None:
            rules = spark.createDataFrame([], RULE_SCHEMA).select(*_STATE_COLS)
        return evaluate_rules(events, rules)

    def add_events_batch(
        self,
        batch_events: DataFrame,
        batch_id: int | None = None,
        on_hits=None,
    ) -> list[tuple]:
        """Evaluate one event micro-batch against the current rules;
        returns the batch's hits (rule_id, event_id, user_id, us,
        value). ``on_hits`` (the downstream sink) is invoked BEFORE the
        durable guard commit — a sink failure fails the batch
        pre-commit so a retry re-delivers (at-least-once) instead of
        hitting the replay guard. Replays of committed batches return
        []."""
        if not self._restored:
            self._restore(batch_events.sparkSession)
        if (
            batch_id is not None
            and self.last_events_batch_id is not None
            and batch_id <= self.last_events_batch_id
        ):
            return []
        hits = [
            (r["rule_id"], r["event_id"], r["user_id"], r["us"], r["value"])
            for r in self.evaluate(batch_events).collect()
        ]
        if on_hits is not None:
            on_hits(hits)
        if batch_id is not None:
            self._persist(
                batch_events.sparkSession,
                self.rules,
                self.last_rules_batch_id,
                int(batch_id),
            )
            self.last_events_batch_id = int(batch_id)
        return hits

    def rule_count(self) -> int:
        return 0 if self.rules is None else self.rules.count()
