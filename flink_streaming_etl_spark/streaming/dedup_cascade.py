"""The streaming dedup CASCADE: exact-fingerprint tier → MinHash-LSH
near-dup tier, composed per micro-batch — the ordering every production
corpus pipeline runs (the cheap exact tier absorbs bulk duplicates so
the near-dup tier pays signature + LSH + verify only for
exact-unique documents; CCNet/RefinedWeb posture).

Composition contract:

* Tier 1 (:class:`~flink_streaming_etl_spark.streaming.text_dedup
  .BloomTextDedupAccumulator`) folds the WHOLE batch.
* Tier 2 (:class:`~flink_streaming_etl_spark.streaming.neardup
  .MinHashNearDupAccumulator`) folds only the docs tier 1 KEPT this
  batch — tier-1 drops never enter tier 2's index or pay its cost.
* The combined decision log attributes every doc to the tier that
  dropped it (``tier`` ∈ 'exact' | 'near' | NULL for kept) — the
  tier-census view `dedup_tier_agreement_report` audits in batch form.

Each tier keeps its own distributed state, durable store, retention —
this class only routes batches and merges decisions (no new state of
its own, so the per-tier scale arguments carry over unchanged).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_etl_spark.streaming.neardup import (
    MinHashNearDupAccumulator,
)
from flink_streaming_etl_spark.streaming.text_dedup import (
    BloomTextDedupAccumulator,
)


class DedupCascade:
    """Exact → near-dup incremental dedup over a documents stream."""

    def __init__(
        self,
        threshold: float = 0.05,
        retention_batches: int | None = None,
        exact_store_root: str | None = None,
        near_store_root: str | None = None,
        spark: SparkSession | None = None,
    ):
        self.exact = BloomTextDedupAccumulator(
            retention_batches=retention_batches,
            store_root=exact_store_root,
            spark=spark,
        )
        self.near = MinHashNearDupAccumulator(
            threshold=threshold,
            retention_batches=retention_batches,
            store_root=near_store_root,
            spark=spark,
        )

    def add_batch(
        self, batch_documents: DataFrame, batch_id: int | None = None
    ) -> None:
        """Fold one micro-batch through both tiers in order."""
        batch = batch_documents.dropDuplicates(["doc_id"]).localCheckpoint(
            eager=True
        )  # reused: tier-1 fold + survivor routing
        self.exact.add_batch(batch, batch_id=batch_id)
        # tier-1's decisions for THIS batch: semi-join the decision log
        # against the batch ids (relation-side; never collected)
        survivors = batch.join(
            self.exact.kept_rel.filter(F.col("kept")).select("doc_id"),
            "doc_id",
            "semi",
        )
        self.near.add_batch(survivors, batch_id=batch_id)

    def attach(self, stream_documents: DataFrame, **start_kwargs):
        """Wire onto a streaming DataFrame via foreachBatch and start."""
        return (
            stream_documents.writeStream.outputMode("append")
            .foreachBatch(lambda batch, bid: self.add_batch(batch, bid))
            .start(**start_kwargs)
        )

    # -- query side -------------------------------------------------------

    def decisions(self, spark: SparkSession) -> DataFrame:
        """(doc_id, kept, tier): every doc seen so far with the tier
        that dropped it ('exact' | 'near'; NULL tier = kept). A doc the
        exact tier dropped never reached the near tier, so the two
        decision logs partition cleanly."""
        if self.exact.kept_rel is None:
            return spark.createDataFrame(
                [], "doc_id long, kept boolean, tier string"
            )
        ex = self.exact.kept_rel.select(
            "doc_id",
            "kept",
            F.when(~F.col("kept"), F.lit("exact")).alias("tier"),
        )
        if self.near.kept_rel is None:
            return ex
        nd = self.near.kept_rel.select(
            "doc_id",
            "kept",
            F.when(~F.col("kept"), F.lit("near")).alias("tier"),
        )
        # near-tier rows override the exact tier's KEPT verdict for the
        # docs it examined; exact drops pass through untouched
        return ex.join(nd.select("doc_id"), "doc_id", "anti").unionByName(nd)

    def kept_ids(self, spark: SparkSession) -> DataFrame:
        """Doc ids that survived BOTH tiers, as a relation."""
        return self.decisions(spark).filter(F.col("kept")).select("doc_id")

    def tier_census(self, spark: SparkSession) -> DataFrame:
        """(tier, n) — how much each tier removed, plus the kept row
        (tier NULL); the streaming twin of the batch tier-agreement
        audit's headline numbers."""
        return (
            self.decisions(spark)
            .groupBy("tier")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
