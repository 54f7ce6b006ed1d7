"""Streaming text dedup: new-batch-vs-seen-corpus prefix-fingerprint
dedup maintained across micro-batches — the streaming twin of
:func:`~flink_streaming_etl_spark.operators.dedup.bloom_incremental_dedup`
(the batch operator models ONE day's batch against a static corpus; this
accumulator is the daily loop itself, closing the text dedup tier the way
``streaming/media_dedup.py`` closed the media tier in round 8).

Per micro-batch the HEAVY work stays distributed: one batch-sized Spark
job normalizes and fingerprints the batch's documents (identical prefix
key to the batch operator), emitting distinct (doc_id, fp) rows; the
driver collect is bounded by the BATCH size, never corpus volume. Driver
state is two-tier, mirroring the batch operator's scale design:

- a **Bloom bit-set over seen fingerprints** (same BLOOM_BITS /
  BLOOM_HASHES parameters, same md5-salted positions): the O(1)-memory
  tier that survives 100 TB — at scale THIS is the broadcast state and
  candidates pay an exact verification join;
- an **exact fp → first-owner map** standing in for that verification
  join locally, so decisions here are exact (no false positives), which
  is what the equality pin against the batch operator checks;
- **idle retention** (T5 discipline, like ``streaming/anomaly.py``):
  with ``retention_batches=N``, fingerprints unseen for N batches are
  evicted from the exact map (the bloom bits, being the bounded tier,
  only reset wholesale — documented one-way growth, exactly a
  production rotating-bloom).

Replays are idempotent by batch id (same contract as the other
accumulators). First-owner contract (pinned in tests/test_round9.py):
seeding the corpus (even doc_ids) then feeding the incoming split (odd
doc_ids) in batches keeps, per fingerprint, only the FIRST arriving
owner — a SUBSET of what ``bloom_incremental_dedup`` keeps on the full
corpus, since the batch operator keeps every incoming doc whose
fingerprint is absent from the corpus side even when several incoming
docs share it. The two sets are equal exactly when no fingerprint is
duplicated only within the incoming split (ADVICE r9).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_streaming_etl_spark.operators.dedup import (
    BLOOM_BITS,
    BLOOM_HASHES,
    _prefix_fp,
)


def _bloom_positions(fp: str) -> list[int]:
    """Driver-side twin of the batch operator's md5-salted bit positions
    (functions.md5_int(fp, salt=f"bloom{i}") % BLOOM_BITS)."""
    out = []
    for i in range(BLOOM_HASHES):
        h = hashlib.md5(f"bloom{i}:{fp}".encode()).hexdigest()[:8]
        out.append(int(h, 16) % BLOOM_BITS)
    return out


class BloomTextDedupAccumulator:
    """Incremental new-vs-corpus text dedup with bounded driver state."""

    def __init__(self, retention_batches: int | None = None):
        self.retention_batches = retention_batches
        self.bloom: set[int] = set()  # set bit positions (≤ BLOOM_BITS)
        #: fp -> first owner doc_id (the exact-verify tier)
        self.first_owner: dict[str, int] = {}
        self.last_seen: dict[str, int] = {}
        #: doc_id -> kept? decision log (replay-stable)
        self.kept: dict[int, bool] = {}
        self.n_batches = 0
        self.last_batch_id: int | None = None

    # -- streaming side -----------------------------------------------------

    def _batch_fps(self, batch_documents: DataFrame) -> list:
        """Distributed fingerprinting identical to the batch operator."""
        return (
            batch_documents.select(
                "doc_id", _prefix_fp(F.col("text")).alias("fp")
            )
            .distinct()
            .collect()  # bounded by the BATCH's row count
        )

    def add_batch(
        self, batch_documents: DataFrame, batch_id: int | None = None
    ) -> None:
        """foreachBatch hook: decide keep/drop for each batch doc against
        the seen-corpus state (bloom prefilter, exact verify), then fold
        the batch's fingerprints into state. Within a batch, lower doc_id
        wins — the batch operator's deterministic keep-first rule."""
        # Transactional fold ordering (T6, the streaming/cep.py
        # discipline): replay guard CHECKED here, batch id COMMITTED only
        # after the fold succeeds — a batch whose Spark job fails and is
        # retried under the same epoch id re-folds instead of being
        # misclassified as a replay.
        if batch_id is not None:
            if self.last_batch_id is not None and batch_id <= self.last_batch_id:
                return  # replay — already folded
        rows = sorted(self._batch_fps(batch_documents), key=lambda r: r["doc_id"])
        self.n_batches += 1
        for r in rows:
            doc_id, fp = r["doc_id"], r["fp"]
            pos = _bloom_positions(fp)
            candidate = all(p in self.bloom for p in pos)
            # bloom says "maybe seen" → exact verify against the owner map
            # (at 100 TB this is the distributed anti-join of the batch
            # operator; a bloom false positive is caught here)
            dup = candidate and fp in self.first_owner and (
                self.first_owner[fp] != doc_id
            )
            self.kept[doc_id] = not dup
            if fp not in self.first_owner:
                self.first_owner[fp] = doc_id
            self.bloom.update(pos)
            self.last_seen[fp] = self.n_batches
        self._evict()

        if batch_id is not None:
            self.last_batch_id = int(batch_id)

    def _evict(self) -> None:
        if self.retention_batches is None:
            return
        horizon = self.n_batches - self.retention_batches
        if horizon <= 0:
            return
        for fp in [f for f, b in self.last_seen.items() if b <= horizon]:
            del self.last_seen[fp]
            self.first_owner.pop(fp, None)
            # bloom bits stay set — the bounded tier only rotates wholesale

    def attach(self, stream_documents: DataFrame, **start_kwargs):
        """Wire onto a streaming DataFrame via foreachBatch and start."""
        return (
            stream_documents.writeStream.outputMode("append")
            .foreachBatch(lambda batch, bid: self.add_batch(batch, bid))
            .start(**start_kwargs)
        )

    # -- query side ---------------------------------------------------------

    def kept_ids(self, spark: SparkSession, *, only: set[int] | None = None) -> DataFrame:
        """Doc ids decided KEEP so far (optionally restricted to a split,
        e.g. the odd-id incoming side of the batch operator's contract)."""
        ids = [
            (d,)
            for d, keep in sorted(self.kept.items())
            if keep and (only is None or d in only)
        ]
        return spark.createDataFrame(ids, "doc_id long")
