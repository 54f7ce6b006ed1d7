"""Streaming media chunk dedup: new-batch-vs-seen-corpus duplicate pairs
maintained across micro-batches — the streaming twin of
:func:`~flink_streaming_etl_spark.operators.multimodal.media_chunk_dedup`
(r7 verdict #6: the text dedup loop has ``bloom_incremental_dedup`` for
new-vs-corpus; media had none).

Per micro-batch the HEAVY work stays distributed: one batch-sized Spark
job slices payloads into fixed 64-byte chunks and md5-hashes them
(identical chunking to the batch operator), emitting the batch's
DISTINCT (media_id, chash) rows. The driver collect is bounded by the
BATCH's chunk count (payload bytes / chunk_bytes per batch), never by
corpus volume. Driver state maps ``chash -> owner media_ids`` with two
bounds:

- **hot-chunk cap** (the batch operator's owner_cap discipline): a
  chunk's owner list is tracked only up to ``owner_cap + 1`` ids; once
  it exceeds the cap it is marked hot and excluded from pair counting
  from then on — container boilerplate, exactly like hot LSH buckets.
  The cap is applied AS-OF processing time (the batch operator applies
  it over the final corpus — the honest semantic difference of any
  one-pass incremental dedup).
- **idle retention** (the reference's T5 discipline, like
  ``streaming/anomaly.py``): with ``retention_batches=N``, chunks not
  seen for N batches are evicted, bounding state by the active window
  instead of corpus lifetime. At 100 TB the driver dict becomes a
  distributed state store or a bloom+exact-verify tier
  (``bloom_incremental_dedup``'s pattern); the per-batch Spark job and
  the decision rule are unchanged by that swap.

Replays are idempotent by batch id (same contract as
``MisraGriesAccumulator`` / ``AnomalyZScoreAccumulator``).

Equality contract (pytest ``test_streaming_media_chunk_handover``): fed
the corpus in media_id-ordered micro-batches with no hot chunks, the
accumulated pair relation EQUALS the batch operator's output on the
full corpus — same (a_id, b_id, shared_chunks) rows.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_etl_spark.operators.multimodal import (
    MEDIA_CHUNK_BYTES,
    MEDIA_CHUNK_MIN_SHARED,
    MEDIA_CHUNK_OWNER_CAP,
    documents_as_media,
)


class MediaChunkDedupAccumulator:
    """Incremental chunk-level media dedup with bounded driver state."""

    def __init__(
        self,
        chunk_bytes: int = MEDIA_CHUNK_BYTES,
        min_shared: int = MEDIA_CHUNK_MIN_SHARED,
        owner_cap: int = MEDIA_CHUNK_OWNER_CAP,
        retention_batches: int | None = None,
    ):
        self.chunk_bytes = chunk_bytes
        self.min_shared = min_shared
        self.owner_cap = owner_cap
        self.retention_batches = retention_batches
        #: chash -> list of owner media_ids (len <= owner_cap + 1; the
        #: sentinel overflow entry marks the chunk hot)
        self.owners: dict[str, list[int]] = {}
        #: chash -> last batch index that touched it (retention eviction)
        self.last_seen: dict[str, int] = {}
        #: (a_id, b_id) -> shared chunk count over non-hot chunks
        self.pairs: dict[tuple[int, int], int] = defaultdict(int)
        self.n_batches = 0
        self.last_batch_id: int | None = None

    # -- streaming side -----------------------------------------------------

    def _batch_chunks(self, batch_documents: DataFrame) -> list:
        """Distributed chunking identical to the batch operator: distinct
        (media_id, chash) of fixed-size payload slices."""
        m = documents_as_media(batch_documents).select(
            "media_id", "payload", "n_bytes"
        )
        nchunks = F.greatest(
            F.ceil(F.col("n_bytes") / F.lit(self.chunk_bytes)).cast("int"),
            F.lit(1),
        )
        return (
            m.select(
                "media_id",
                "payload",
                F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("ci"),
            )
            .select(
                "media_id",
                F.md5(
                    F.expr(
                        f"substring(payload, ci * {self.chunk_bytes} + 1,"
                        f" {self.chunk_bytes})"
                    )
                ).alias("chash"),
            )
            .distinct()
            .collect()  # bounded by the BATCH's chunk count
        )

    def add_batch(
        self, batch_documents: DataFrame, batch_id: int | None = None
    ) -> None:
        """foreachBatch hook: count each new media's shared chunks against
        every previously-seen owner (and earlier media of the same batch,
        in media_id order), then fold the batch into state."""
        # Transactional fold ordering (T6, the streaming/cep.py
        # discipline): replay guard CHECKED here, batch id COMMITTED only
        # after the fold succeeds — a batch whose Spark job fails and is
        # retried under the same epoch id re-folds instead of being
        # misclassified as a replay.
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return  # replay — already folded
        rows = self._batch_chunks(batch_documents)
        self.n_batches += 1
        by_media: dict[int, list[str]] = defaultdict(list)
        for r in rows:
            by_media[r["media_id"]].append(r["chash"])
        # media_id order within the batch = deterministic intra-batch
        # pairing; pairs are stored ORIENTATION-NORMALIZED (min, max) so
        # out-of-id-order arrival across batches still matches the batch
        # operator's a_id < b_id schema, and a media_id re-delivered
        # under a new batch id neither self-pairs nor double-registers.
        for mid in sorted(by_media):
            shared: dict[int, int] = defaultdict(int)
            for ch in by_media[mid]:
                own = self.owners.get(ch)
                if own is not None and len(own) <= self.owner_cap:
                    for prior in own:
                        if prior != mid:  # re-delivery: never self-pair
                            shared[prior] += 1
            for prior, n in shared.items():
                if n >= self.min_shared:
                    self.pairs[(min(prior, mid), max(prior, mid))] = n
            for ch in by_media[mid]:
                own = self.owners.setdefault(ch, [])
                if len(own) <= self.owner_cap and mid not in own:
                    own.append(mid)
                self.last_seen[ch] = self.n_batches
        self._evict()

        if batch_id is not None:
            self.last_batch_id = int(batch_id)

    def _evict(self) -> None:
        if self.retention_batches is None:
            return
        horizon = self.n_batches - self.retention_batches
        if horizon <= 0:
            return
        for ch in [c for c, b in self.last_seen.items() if b <= horizon]:
            del self.last_seen[ch]
            self.owners.pop(ch, None)

    def attach(self, stream_documents: DataFrame, **start_kwargs):
        """Wire onto a streaming DataFrame via foreachBatch and start."""
        return (
            stream_documents.writeStream.outputMode("append")
            .foreachBatch(lambda batch, bid: self.add_batch(batch, bid))
            .start(**start_kwargs)
        )

    # -- query side ---------------------------------------------------------

    def result(self, spark: SparkSession) -> DataFrame:
        """Accumulated duplicate pairs — same schema and (under the
        equality contract above) same rows as the batch operator."""
        out = [
            (a, b, int(n))
            for (a, b), n in sorted(self.pairs.items())
            if n >= self.min_shared
        ]
        return spark.createDataFrame(
            out, "a_id long, b_id long, shared_chunks long"
        )
