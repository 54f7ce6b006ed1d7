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
