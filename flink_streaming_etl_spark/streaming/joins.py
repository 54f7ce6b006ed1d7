"""Watermarked stream-stream operators.

The reference's P3/P4 joins (flink-ddl.sql:179-190, 248-256) are regular
streaming joins over unbounded CDC streams — Flink keeps both sides' state
forever (idle-state-retention 0, sql-client-conf.yaml:33-34). Spark's
Structured Streaming makes the state bound explicit instead: each side
declares a watermark and the join condition carries a time range, so the
store evicts rows the range can never match again. These builders are the
stream-native counterparts of the batch operators in operators/analytics.py
and operators/dedup.py; tests replay a file source with availableNow and
assert the drained result equals the batch query.

State sizing at scale: the join state holds only rows inside the watermark
horizon per key — with a 1 h range and 10 min watermark that's ~70 min of
stream per side, independent of total history. Streaming dedup state is
likewise bounded by `dropDuplicatesWithinWatermark` (vs. unbounded
`dropDuplicates`), the difference between a pipeline that runs for a day
and one that runs for a year.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def purchase_click_join_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Stream-stream inner join: purchases matched to same-user clicks in the
    preceding hour (the streaming face of
    ``analytics.clicks_before_purchase``; inner, because an outer streaming
    join can only emit the unmatched side after watermark expiry).

    Both sides derive from one input stream; each gets its own watermark so
    the state store can evict independently. The range predicate
    ``pts - 1h <= cts < pts`` gives Spark the eviction bound.
    """
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("u"),
            F.col("ts").alias("pts"),
        )
        .withWatermark("pts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(F.col("user_id").alias("cu"), F.col("ts").alias("cts"))
        .withWatermark("cts", watermark)
    )
    return purchases.join(
        clicks,
        (purchases.u == clicks.cu)
        & (clicks.cts >= purchases.pts - F.expr("INTERVAL 1 HOUR"))
        & (clicks.cts < purchases.pts),
        "inner",
    ).select("purchase_id", F.col("u").alias("user_id"), "pts", "cts")


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming exact dedup with bounded state: first occurrence per key
    wins, duplicates arriving within the watermark horizon are dropped, and
    state for keys older than the horizon is evicted (batch
    ``dedup_exact``'s streaming face; with at-least-once upstream delivery
    this is how effectively-once ingestion is built).
    """
    keyed = events.withWatermark("ts", watermark)
    return keyed.dropDuplicatesWithinWatermark(keys or ["event_id"])
