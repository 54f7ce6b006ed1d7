"""Streaming heavy hitters: a mergeable Misra-Gries summary maintained
across micro-batches, with a kappa-style exact verify at handover.

Misra-Gries summaries are natively mergeable (Agarwal et al., "Mergeable
Summaries", PODS 2012): adding an exact batch counter into a summary and
reducing back to capacity yields an MG summary of the concatenated stream,
with total undercount <= n/(cap+1). So the streaming twin of
:func:`~flink_streaming_etl_spark.operators.text.heavy_hitter_tokens`
keeps O(cap) state REGARDLESS of stream length or vocabulary size:

- per micro-batch, tokens are exact-counted batch-locally (a micro-batch
  is small by construction) and the tiny counter merges driver-side;
- every token with true frequency > n_total/cap is guaranteed to survive
  in the summary (no false negatives), each with bounds
  mg_count <= true_count <= mg_count + max_undercount;
- at handover, :meth:`MisraGriesAccumulator.exact_verify` recounts ONLY
  the surviving candidates over the replayable corpus (broadcast
  semi-join) — the same sketch-for-pruning-never-for-result philosophy as
  the batch operator, and the streaming/batch results are then EQUAL.

The per-batch tokenize+count shuffle is batch-sized, not corpus-sized; the
driver-side merge handles <= cap rows per batch, mirroring how
:class:`~flink_streaming_etl_spark.streaming.upsert_sink.AdditivePartialSink`
merges window partials.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_SPLIT_RE = r"\s+"


def tokens_of(documents: DataFrame) -> DataFrame:
    return documents.select(
        F.explode(F.split(F.trim("text"), TOKEN_SPLIT_RE)).alias("token")
    )


class MisraGriesAccumulator:
    """Mergeable MG summary with exact undercount tracking.

    ``counts`` holds at most ``cap`` tokens; ``max_undercount`` is the sum
    of all reduction decrements so far, so for every tracked token
    ``counts[t] <= true_count(t) <= counts[t] + max_undercount``, and any
    token with ``true_count > n_total / cap`` is guaranteed tracked.
    """

    def __init__(self, cap: int):
        if cap < 1:
            raise ValueError("cap must be >= 1")
        self.cap = int(cap)
        self.counts: Counter = Counter()
        self.n_total = 0
        self.max_undercount = 0

    # -- streaming side -----------------------------------------------------

    def add_batch(self, batch_documents: DataFrame) -> None:
        """foreachBatch hook: exact-count the micro-batch's tokens, merge.

        The aggregation is batch-local (micro-batches are small); only the
        distinct-token counter crosses to the driver.
        """
        rows = (
            tokens_of(batch_documents)
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        self.add_counter(Counter({r["token"]: r["n"] for r in rows}))

    def add_counter(self, batch_counts: Counter) -> None:
        self.n_total += sum(batch_counts.values())
        self.counts.update(batch_counts)
        if len(self.counts) > self.cap:
            # subtract the (cap+1)-th largest count from everything and drop
            # the non-positives: one reduction charges its decrement against
            # > cap distinct tokens, keeping total undercount <= n/(cap+1).
            sub = sorted(self.counts.values(), reverse=True)[self.cap]
            self.counts = Counter(
                {t: c - sub for t, c in self.counts.items() if c - sub > 0}
            )
            self.max_undercount += sub

    def attach(self, stream_documents: DataFrame, **start_kwargs):
        """Wire this accumulator onto a streaming DataFrame via foreachBatch
        and start the query (caller owns the returned StreamingQuery)."""
        return (
            stream_documents.writeStream.outputMode("append")
            .foreachBatch(lambda batch, _id: self.add_batch(batch))
            .start(**start_kwargs)
        )

    # -- query side ---------------------------------------------------------

    def candidate_rows(self, k: int) -> list[tuple[str, int, int]]:
        """(token, count_lower, count_upper) for every candidate that COULD
        exceed the n_total/k threshold. Superset of the true heavy hitters
        (no false negatives for any k <= cap)."""
        out = []
        for t, c in self.counts.items():
            if (c + self.max_undercount) * k > self.n_total:
                out.append((t, c, c + self.max_undercount))
        return sorted(out)

    def exact_verify(
        self, spark: SparkSession, documents: DataFrame, k: int
    ) -> DataFrame:
        """Kappa handover: exact-count ONLY the tracked candidates over the
        replayable corpus. Result equals the batch ``heavy_hitter_tokens``
        operator (same schema: token, n, n_total)."""
        if not self.counts:
            return spark.createDataFrame([], "token string, n long, n_total long")
        cand = spark.createDataFrame(
            [(t,) for t in self.counts], "token string"
        )
        toks = tokens_of(documents)
        return (
            toks.join(F.broadcast(cand), "token")
            .groupBy("token")
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") * k > F.lit(self.n_total))
            .select(
                "token", "n", F.lit(self.n_total).cast("long").alias("n_total")
            )
        )
