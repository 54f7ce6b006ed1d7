"""Multimodal-column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode/feature libraries (PIL, librosa, ffmpeg) are NOT in this
container, so the media decoding itself is stubbed (clearly marked below);
the Spark-side plumbing — binary schema, Arrow-batched `mapInPandas`
signatures, partition-sized batch flow, metadata extraction — is real and
tested. ``documents.text`` stands in as the payload source (UTF-8 bytes).

Scale notes: binary payloads ride in parquet binary columns; decode runs as
`mapInPandas` (one Arrow batch per ~10k rows, payload never leaves the
executor); metadata-only queries never touch the payload column thanks to
parquet column pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Canonical multimodal record schema: opaque payload + typed metadata.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),  # image|audio|video
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        StructField("checksum", StringType(), True),
    ]
)


def documents_as_media(documents: DataFrame) -> DataFrame:
    """Wrap document text as a binary payload column (the test stand-in for
    real media ingestion — same schema, partitioning, and pruning shape)."""
    payload = F.encode(F.col("text"), "UTF-8")
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("image"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio"))
        .otherwise(F.lit("video"))
        .alias("media_type"),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.md5(payload).alias("checksum"),
    )


def media_metadata(documents: DataFrame) -> DataFrame:
    """Metadata-only projection — the payload column is pruned at scan."""
    return documents_as_media(documents).select(
        "media_id", "media_type", "n_bytes", "checksum"
    )


MEDIA_METADATA_SQL = """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'image'
            WHEN doc_id % 3 = 1 THEN 'audio'
            ELSE 'video' END AS media_type,
       octet_length(encode(text)) AS n_bytes,
       md5(text) AS checksum
FROM documents
"""


_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("mean_byte", DoubleType(), True),
        StructField("n_frames", LongType(), True),
    ]
)


def extract_features(media: DataFrame, batch_hint: int = 10_000) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The *feature math* on real media is stubbed (`_decode_media`); the
    deterministic fake (byte statistics + fixed frame sampling) keeps the
    whole pipeline runnable and testable end-to-end.
    """

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    # deterministic fake "decode": byte mean / frame count
                    "mean_byte": payloads.map(
                        lambda b: float(sum(b)) / len(b) if b else 0.0
                    ),
                    "n_frames": payloads.map(lambda b: (len(b) // 64) + 1 if b else 0),
                }
            )
            yield out

    return media.mapInPandas(compute, schema=_FEATURE_SCHEMA)


def _decode_media(payload: bytes, media_type: str):
    """STUB: real image/audio/video decoding (PIL / librosa / ffmpeg).

    These libraries are not available in this container; the plumbing above
    uses deterministic byte statistics instead. Swap this in on a cluster
    with media libs installed.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this environment"
    )
