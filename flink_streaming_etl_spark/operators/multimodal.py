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


def media_dedup(documents: DataFrame) -> DataFrame:
    """Exact content dedup over the binary payload: group by the 16-byte
    content checksum, keep the smallest id per content class. One
    hash-shuffle on the digest — the payload itself never moves (the
    checksum is computed map-side at the scan), which is what makes exact
    media dedup tractable at 100 TB: shuffle volume ∝ #objects × 16 bytes,
    not media bytes."""
    m = documents_as_media(documents).select("media_id", "checksum")
    return m.groupBy("checksum").agg(
        F.min("media_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


MEDIA_DEDUP_SQL = """
SELECT md5(text) AS checksum, MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
FROM documents GROUP BY 1
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
    with media libs installed. For a REAL decode path that needs no
    external libs, see :func:`media_ppm_features` below (binary PPM/P6
    container, parsed per the netpbm spec).
    """
    raise NotImplementedError(
        "media decoding requires image/audio libs not present in this environment"
    )


# ---------------------------------------------------------------------------
# REAL decode path (round 13): PPM (netpbm P6) is a binary image container
# parseable without external libraries — ASCII header (magic, width,
# height, maxval, '#' comments) followed by width*height*3 raw RGB bytes.
# ``documents_as_ppm`` ENCODES each document into a genuine P6 payload
# (pixels = the text's UTF-8 bytes tiled to the raster size — Spark-side
# binary concat, engine-exact), and ``ppm_decode_features`` DECODES it:
# an actual header parse + raster channel statistics, not a byte-stat
# fake. Exactness: per-channel means are integer sums over 64 pixels
# divided by a power of two — bit-identical in Spark, numpy, and DuckDB.

PPM_W = 8
PPM_H = 8
_PPM_RASTER = PPM_W * PPM_H * 3

_PPM_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("maxval", LongType(), False),
        StructField("n_pixels", LongType(), False),
        StructField("mean_r", DoubleType(), False),
        StructField("mean_g", DoubleType(), False),
        StructField("mean_b", DoubleType(), False),
    ]
)


def documents_as_ppm(documents: DataFrame) -> DataFrame:
    """Encode every document as a VALID binary PPM (P6) image: an ASCII
    header plus the text's UTF-8 bytes tiled/truncated to the 8×8 RGB
    raster (an empty text yields a black image). All engine-side binary
    ops — the payload is a real image file any netpbm tool could open.
    Byte-exactness note: tiling repeats the STRING then slices the
    encoded bytes; for the (verified single-byte) corpus this equals
    byte-level tiling, which is what the DuckDB oracle computes."""
    n = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    reps = F.ceil(F.lit(_PPM_RASTER) / n).cast("int")
    body = F.when(
        n == 0, F.lit(bytes(_PPM_RASTER))
    ).otherwise(
        F.expr(
            f"substring(encode(repeat(text, CAST(ceil({_PPM_RASTER} / "
            f"octet_length(encode(text, 'UTF-8'))) AS INT)), 'UTF-8'), "
            f"1, {_PPM_RASTER})"
        )
    )
    header = F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n".encode())
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, body).alias("payload"),
    )


def _parse_ppm_at(b: bytes, pos: int = 0) -> tuple[int, int, int, bytes, int]:
    """Real netpbm P6 parse starting at ``pos``: magic, '#' comments,
    whitespace-separated width/height/maxval, ONE whitespace byte, then
    the raw raster. Returns (w, h, maxval, raster, next_pos) —
    ``next_pos`` is the offset just past this image, which is where the
    NEXT image of a multi-frame PNM stream begins."""
    if b is None or len(b) < pos + 2 or b[pos : pos + 2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    pos += 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos < len(b) and b[pos : pos + 1] == b"#":  # header comment
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        fields.append(int(b[start:pos]))
    pos += 1  # exactly one whitespace byte separates header and raster
    w, h, maxval = fields
    raster = b[pos : pos + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError(
            f"PPM raster truncated: want {w * h * 3} bytes, got {len(raster)}"
        )
    return w, h, maxval, raster, pos + w * h * 3


def _parse_ppm(b: bytes) -> tuple[int, int, int, bytes]:
    """Single-image convenience wrapper over :func:`_parse_ppm_at`."""
    w, h, maxval, raster, _end = _parse_ppm_at(b, 0)
    return w, h, maxval, raster


def ppm_decode_features(media_ppm: DataFrame) -> DataFrame:
    """REAL decode over (media_id, payload) PPM rows: parse the header,
    reshape the raster, per-channel means. Arrow-batched ``mapInPandas``;
    a malformed payload raises (no silent byte-stat fallback)."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, maxval, raster = _parse_ppm(bytes(payload))
                px = np.frombuffer(raster, dtype=np.uint8).reshape(w * h, 3)
                means = px.astype(np.float64).mean(axis=0)
                rows.append(
                    (mid, w, h, maxval, w * h,
                     float(means[0]), float(means[1]), float(means[2]))
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "width", "height", "maxval", "n_pixels",
                    "mean_r", "mean_g", "mean_b",
                ],
            )

    return media_ppm.mapInPandas(compute, schema=_PPM_FEATURE_SCHEMA)


def media_ppm_features(documents: DataFrame) -> DataFrame:
    """Registry entry: encode the corpus as real PPM payloads, then run
    the real decoder — the end-to-end media feature pipeline with an
    exact cross-engine oracle (the r12 rows-only ``media_features`` cell
    earned its oracle row here)."""
    return ppm_decode_features(documents_as_ppm(documents))


def ppm_resize(media_ppm: DataFrame, out_w: int = 4, out_h: int = 4) -> DataFrame:
    """REAL image resize over PPM payloads: decode (header parse +
    raster reshape), nearest-neighbor sample to ``out_w``×``out_h``,
    re-encode as a valid P6 payload. The output rows are genuine PPM
    images — :func:`ppm_decode_features` runs on them unchanged.
    Payloads never leave the executor (Arrow-batched mapInPandas)."""
    import numpy as np

    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = f"P6\n{out_w} {out_h}\n255\n".encode()
        for pdf in batches:
            ids, outs = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                w, h, _maxval, raster = _parse_ppm(bytes(payload))
                px = np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)
                # nearest-neighbor: source row/col = floor(out_idx * in/out)
                rows = (np.arange(out_h) * h) // out_h
                cols = (np.arange(out_w) * w) // out_w
                small = px[rows][:, cols]
                ids.append(mid)
                outs.append(header + small.tobytes())
            yield pd.DataFrame({"media_id": ids, "payload": outs})

    return media_ppm.mapInPandas(compute, schema=schema)


def media_resize_report(documents: DataFrame) -> DataFrame:
    """Registry entry: encode → REAL resize (nearest-neighbor 8×8 → 4×4)
    → REAL decode of the resized payloads. Every stage is a genuine PPM
    round-trip; the oracle replays the sampling arithmetic exactly."""
    return ppm_decode_features(ppm_resize(documents_as_ppm(documents)))


# resized pixel (rr, cc) samples source pixel (rr*8//4, cc*8//4) =
# (2*rr, 2*cc); source byte index of channel ch = ((2*rr)*8 + 2*cc)*3 + ch
MEDIA_RESIZE_REPORT_SQL = """
WITH m AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
  FROM documents
), px AS (
  SELECT media_id, ch,
         CASE WHEN n = 0 THEN 0
              ELSE ascii(substr(text,
                   CAST(((2 * (k // 4)) * 8 + 2 * (k % 4)) * 3 + ch AS INT)
                   % n + 1, 1)) END AS v
  FROM m,
       (SELECT UNNEST(range(0, 16)) AS k) pk,
       (SELECT UNNEST(range(0, 3)) AS ch) pc
)
SELECT media_id,
       4 AS width, 4 AS height, 255 AS maxval, 16 AS n_pixels,
       AVG(CASE WHEN ch = 0 THEN v END) AS mean_r,
       AVG(CASE WHEN ch = 1 THEN v END) AS mean_g,
       AVG(CASE WHEN ch = 2 THEN v END) AS mean_b
FROM px
GROUP BY media_id
"""


# --- multi-frame PNM streams (the "video" modality) ------------------------
# A concatenation of P6 images is a real format (netpbm streams; what
# ppmtoy4m consumes). Frame f of a document tiles the text bytes with a
# rotating offset, so frames differ deterministically.

PNM_FRAMES = 3
_FRAME_OFFSET = 17


def documents_as_pnm_stream(documents: DataFrame) -> DataFrame:
    """Encode every document as a 3-frame P6 stream: frame f's raster is
    the text's bytes tiled from offset ``f*17 mod n``. Engine-side binary
    concat — each payload is a genuine multi-image netpbm stream."""
    n = F.octet_length(F.encode(F.col("text"), "UTF-8"))
    header = F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n".encode())
    frames = []
    for f in range(PNM_FRAMES):
        off = f * _FRAME_OFFSET
        # rotate by off then tile: slice the repeated text starting at
        # char (off % n) + 1 for RASTER chars (single-byte corpus:
        # char slicing == byte slicing, as in documents_as_ppm)
        rot = (
            f"substring(repeat(text, CAST(ceil(({_PPM_RASTER} + {off}) / "
            f"octet_length(encode(text, 'UTF-8'))) AS INT) + 1), "
            f"CAST({off} % octet_length(encode(text, 'UTF-8')) AS INT) + 1, "
            f"{_PPM_RASTER})"
        )
        body = F.when(n == 0, F.lit(bytes(_PPM_RASTER))).otherwise(
            F.expr(f"encode({rot}, 'UTF-8')")
        )
        frames.append(header)
        frames.append(body)
    return documents.select(
        F.col("doc_id").alias("media_id"),
        F.concat(*frames).alias("payload"),
    )


_PNM_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("mean_r", DoubleType(), False),
        StructField("mean_g", DoubleType(), False),
        StructField("mean_b", DoubleType(), False),
    ]
)


def pnm_sample_frames(media_stream: DataFrame, every_n: int = 2) -> DataFrame:
    """REAL frame extraction: parse consecutive P6 images out of each
    stream payload (repeated header parse — the actual netpbm stream
    grammar), keep every ``every_n``-th frame, report per-frame channel
    means. The 1:N explode stage of a video pipeline, frames
    executor-local."""
    import numpy as np

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                pos, fi = 0, 0
                while pos < len(b):
                    w, h, _maxval, raster, pos = _parse_ppm_at(b, pos)
                    if fi % every_n == 0:
                        px = np.frombuffer(raster, dtype=np.uint8).reshape(
                            w * h, 3
                        )
                        means = px.astype(np.float64).mean(axis=0)
                        rows.append(
                            (mid, fi, float(means[0]), float(means[1]),
                             float(means[2]))
                        )
                    fi += 1
            yield pd.DataFrame(
                rows,
                columns=["media_id", "frame_idx", "mean_r", "mean_g", "mean_b"],
            )

    return media_stream.mapInPandas(compute, schema=_PNM_FRAME_SCHEMA)


def media_frames_report(documents: DataFrame) -> DataFrame:
    """Registry entry: encode → REAL multi-frame stream parse → sampled
    per-frame channel means (frames 0 and 2 of 3)."""
    return pnm_sample_frames(documents_as_pnm_stream(documents))


# frame f tiles text bytes from offset f*17: byte i of frame f =
# text[(i + f*17) % n]; sampled frames = 0 and 2 (every_n=2 of 3)
MEDIA_FRAMES_REPORT_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
  FROM documents
), px AS (
  SELECT media_id, fr * 2 AS frame_idx, i % 3 AS channel,
         CASE WHEN n = 0 THEN 0
              ELSE ascii(substr(text,
                   CAST((i + fr * 2 * {_FRAME_OFFSET}) % n AS INT) + 1, 1))
         END AS v
  FROM m,
       (SELECT UNNEST(range(0, {_PPM_RASTER})) AS i) pi,
       (SELECT UNNEST(range(0, 2)) AS fr) pf
)
SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       AVG(CASE WHEN channel = 0 THEN v END) AS mean_r,
       AVG(CASE WHEN channel = 1 THEN v END) AS mean_g,
       AVG(CASE WHEN channel = 2 THEN v END) AS mean_b
FROM px
GROUP BY media_id, frame_idx
"""


MEDIA_PPM_FEATURES_SQL = f"""
WITH m AS (
  SELECT doc_id AS media_id, text, octet_length(encode(text)) AS n
  FROM documents
), px AS (
  -- the oracle recomputes the decoder's view of the raster: byte i of
  -- the tiled text (single-byte corpus: char index == byte index),
  -- channel = i % 3
  SELECT media_id, i % 3 AS channel,
         CASE WHEN n = 0 THEN 0
              ELSE ascii(substr(text, CAST(i % n AS INT) + 1, 1)) END AS v
  FROM m, (SELECT UNNEST(range(0, {_PPM_RASTER})) AS i) r
)
SELECT media_id,
       {PPM_W} AS width, {PPM_H} AS height, 255 AS maxval,
       {PPM_W * PPM_H} AS n_pixels,
       AVG(CASE WHEN channel = 0 THEN v END) AS mean_r,
       AVG(CASE WHEN channel = 1 THEN v END) AS mean_g,
       AVG(CASE WHEN channel = 2 THEN v END) AS mean_b
FROM px
GROUP BY media_id
"""


# ---------------------------------------------------------------------------
# Resize / frame-sample: the transform stages of a media pipeline. Decode is
# stubbed (no PIL/ffmpeg in this container) behind a deterministic fake so
# the Spark-side contract — schema, Arrow batch shape, payload-local
# processing, metadata passthrough — is real and tested end to end.

_RESIZE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("width", LongType(), False),
        StructField("height", LongType(), False),
        StructField("payload", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
    ]
)


def resize_images(media: DataFrame, width: int = 32, height: int = 32) -> DataFrame:
    """'Resize' every image payload to width×height.

    Real implementation decodes with PIL and re-encodes (see
    ``_decode_media``); the deterministic fake tiles/truncates the payload
    bytes to exactly width*height bytes — preserving the contract that the
    output payload is a fixed-size function of (input payload, target dims)
    and never leaves the executor."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height

        def fake_resize(b):
            if not b:
                return bytes(target)
            reps = -(-target // len(b))
            return (bytes(b) * reps)[:target]

        for pdf in batches:
            out = pdf[pdf["media_type"] == "image"].copy()
            out["payload"] = out["payload"].map(fake_resize)
            yield pd.DataFrame(
                {
                    "media_id": out["media_id"],
                    "media_type": out["media_type"],
                    "width": width,
                    "height": height,
                    "payload": out["payload"],
                    "n_bytes": out["payload"].map(len),
                }
            )

    return media.mapInPandas(compute, schema=_RESIZE_SCHEMA)


_FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("frame_idx", LongType(), False),
        StructField("frame", BinaryType(), True),
    ]
)

FRAME_SIZE = 64  # fake decode: one "frame" per 64 payload bytes


def sample_frames(media: DataFrame, every_n: int = 2, max_frames: int = 4) -> DataFrame:
    """Sample every ``every_n``-th frame (up to ``max_frames``) from each
    video payload — the 1:N explode stage of a video pipeline. Real decode
    would use ffmpeg; the fake treats each 64-byte slice as one frame.
    Output fans out rows ×max_frames at most; frames stay executor-local."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            vids = pdf[pdf["media_type"] == "video"]
            for mid, payload in zip(vids["media_id"], vids["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                n_frames = max(1, len(b) // FRAME_SIZE)
                taken = 0
                for fi in range(0, n_frames, every_n):
                    if taken >= max_frames:
                        break
                    ids.append(mid)
                    idxs.append(fi)
                    frames.append(b[fi * FRAME_SIZE : (fi + 1) * FRAME_SIZE])
                    taken += 1
            yield pd.DataFrame({"media_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(compute, schema=_FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# Chunk-level binary dedup — media sharing many content chunks are
# partial duplicates (same video re-muxed, same image re-headered):
# fixed-size byte chunks hashed with md5, pairs found by chunk-hash
# equi-join (never all-pairs), hot chunks capped exactly like hot LSH
# buckets (a chunk shared by >CAP media is container boilerplate, not
# content). All engine-exact: byte slicing + md5 + integer counts.

MEDIA_CHUNK_BYTES = 64
MEDIA_CHUNK_OWNER_CAP = 50
MEDIA_CHUNK_MIN_SHARED = 2


def media_chunk_dedup(
    documents: DataFrame,
    chunk_bytes: int = MEDIA_CHUNK_BYTES,
    min_shared: int = MEDIA_CHUNK_MIN_SHARED,
    owner_cap: int = MEDIA_CHUNK_OWNER_CAP,
) -> DataFrame:
    m = documents_as_media(documents).select("media_id", "payload", "n_bytes")
    nchunks = F.greatest(
        F.ceil(F.col("n_bytes") / F.lit(chunk_bytes)).cast("int"), F.lit(1)
    )
    # r14 note: a memo_persist of this relation (one md5 pass instead of
    # two) was measured under the full bench methodology and REJECTED —
    # media_chunk_dedup 1.8 s → 3.5 s at sf0.1: AQE overlaps the two
    # consumer branches on idle cores, so the cache-materialization
    # barrier costs more wall than the duplicated hashing pass it avoids.
    chunks = (
        m.select(
            "media_id",
            "payload",
            F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("ci"),
        )
        .select(
            "media_id",
            F.md5(
                F.expr(f"substring(payload, ci * {chunk_bytes} + 1, {chunk_bytes})")
            ).alias("chash"),
        )
        .distinct()
    )
    # hot-chunk cap: a chunk owned by more than owner_cap media is
    # structural boilerplate — joining it would explode quadratically.
    owners = (
        chunks.groupBy("chash")
        .agg(F.count(F.lit(1)).alias("_own"))
        .filter((F.col("_own") >= 2) & (F.col("_own") <= owner_cap))
        .select("chash")
    )
    keyed = chunks.join(owners, "chash", "left_semi")
    a = keyed.select(F.col("media_id").alias("a_id"), "chash")
    b = keyed.select(F.col("media_id").alias("b_id"), "chash")
    return (
        a.join(b, "chash")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_chunks"))
        .filter(F.col("shared_chunks") >= min_shared)
    )


def media_chunk_dedup_sql(
    chunk_bytes: int = MEDIA_CHUNK_BYTES,
    min_shared: int = MEDIA_CHUNK_MIN_SHARED,
    owner_cap: int = MEDIA_CHUNK_OWNER_CAP,
) -> str:
    return f"""
WITH m AS (
  -- DuckDB cannot slice BLOBs; the corpus is single-byte (verified
  -- octet_length == length corpus-wide), so char-substring + md5 of the
  -- VARCHAR chunk is byte-identical to Spark's binary slice + md5.
  SELECT doc_id AS media_id, text AS payload,
         octet_length(encode(text)) AS n_bytes
  FROM documents
), chunks AS (
  SELECT DISTINCT media_id,
         md5(substring(payload, ci * {chunk_bytes} + 1, {chunk_bytes})) AS chash
  FROM m, LATERAL (
    SELECT UNNEST(range(0, GREATEST(CAST(CEIL(n_bytes / {chunk_bytes}.0) AS INT), 1))) AS ci
  ) r
), owners AS (
  SELECT chash FROM chunks GROUP BY chash
  HAVING COUNT(*) BETWEEN 2 AND {owner_cap}
), keyed AS (
  SELECT c.media_id, c.chash FROM chunks c SEMI JOIN owners o ON c.chash = o.chash
)
SELECT a.media_id AS a_id, b.media_id AS b_id,
       CAST(COUNT(*) AS BIGINT) AS shared_chunks
FROM keyed a JOIN keyed b ON a.chash = b.chash AND a.media_id < b.media_id
GROUP BY 1, 2
HAVING COUNT(*) >= {min_shared}
"""


# ---------------------------------------------------------------------------
# Media SimHash near-dup pairs — byte-level SimHash over sliding payload
# 4-grams (stride 2): the similarity tier between exact checksum dedup
# and chunk dedup — robust to small byte edits ANYWHERE in the payload
# (chunk dedup only survives edits that respect chunk boundaries).
# Candidate generation is banded (4 x 8-bit bands of the 32-bit code,
# pigeonhole: hamming <= 3 guarantees a shared band) with a hot-band
# owner cap, so pair volume is band-bucket-bounded, never all-pairs.
# Engine-exact: md5-derived gram hashes, integer bit votes, popcount.

MEDIA_SIMHASH_BITS = 32
MEDIA_SIMHASH_BANDS = 4
MEDIA_SIMHASH_MAX_HAMMING = 3
MEDIA_SIMHASH_BAND_CAP = 200


def media_simhash_pairs(
    documents: DataFrame,
    max_hamming: int = MEDIA_SIMHASH_MAX_HAMMING,
    band_cap: int = MEDIA_SIMHASH_BAND_CAP,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import md5_int

    m = documents_as_media(documents).select("media_id", "payload", "n_bytes")
    grams = m.filter(F.col("n_bytes") >= 4).select(
        "media_id",
        F.explode(F.sequence(F.lit(1), F.col("n_bytes") - 3, F.lit(2))).alias(
            "pos"
        ),
        "payload",
    ).select(
        "media_id",
        md5_int(F.expr("substring(payload, pos, 4)"), 8).alias("h32"),
    )
    votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("h32"), b).bitwiseAND(F.lit(1)) == 1, F.lit(1)
            ).otherwise(F.lit(-1))
        ).alias(f"v{b}")
        for b in range(MEDIA_SIMHASH_BITS)
    ]
    g = grams.groupBy("media_id").agg(*votes)
    sig = F.lit(0).cast("long")
    for b in range(MEDIA_SIMHASH_BITS):
        sig = sig + F.when(
            F.col(f"v{b}") >= 0, F.shiftleft(F.lit(1).cast("long"), b)
        ).otherwise(F.lit(0))
    # r14 note: a memo_persist of the coded relation (the byte-gram md5 +
    # 32-vote pipeline would run once instead of per consumer) was measured
    # under the full bench methodology and REJECTED — media_simhash_pairs
    # 2.4 s → 4.2 s at sf0.1, same AQE-overlap-vs-barrier trade as
    # media_chunk_dedup above.
    coded = g.select("media_id", sig.alias("code"))
    band_bits = MEDIA_SIMHASH_BITS // MEDIA_SIMHASH_BANDS
    bands = coded.select(
        "media_id",
        "code",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.shiftright(F.col("code"), bi * band_bits)
                        .bitwiseAND(F.lit((1 << band_bits) - 1))
                        .alias("val"),
                    )
                    for bi in range(MEDIA_SIMHASH_BANDS)
                ]
            )
        ).alias("bv"),
    ).select("media_id", "code", F.col("bv.band").alias("band"), F.col("bv.val").alias("val"))
    hot = (
        bands.groupBy("band", "val")
        .agg(F.count(F.lit(1)).alias("_own"))
        .filter((F.col("_own") >= 2) & (F.col("_own") <= band_cap))
        .select("band", "val")
    )
    keyed = bands.join(hot, ["band", "val"], "left_semi")
    a = keyed.select(F.col("media_id").alias("a_id"), F.col("code").alias("ca"), "band", "val")
    b = keyed.select(F.col("media_id").alias("b_id"), F.col("code").alias("cb"), "band", "val")
    ham = F.bit_count(F.col("ca").bitwiseXOR(F.col("cb"))).cast("int")
    return (
        a.join(b, ["band", "val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", ham.alias("hamming"))
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def media_simhash_pairs_sql(
    max_hamming: int = MEDIA_SIMHASH_MAX_HAMMING,
    band_cap: int = MEDIA_SIMHASH_BAND_CAP,
) -> str:
    from flink_streaming_etl_spark.functions import md5_int_sql

    bits = MEDIA_SIMHASH_BITS
    band_bits = bits // MEDIA_SIMHASH_BANDS
    h = md5_int_sql("substring(payload, CAST(pos AS INT), 4)", 8)
    votes = ", ".join(
        f"SUM(CASE WHEN (h32 >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"(CASE WHEN v{b} >= 0 THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(bits)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT media_id, code, {bi} AS band,"
        f" (code >> {bi * band_bits}) & {(1 << band_bits) - 1} AS val FROM coded"
        for bi in range(MEDIA_SIMHASH_BANDS)
    )
    return f"""
WITH m AS (
  SELECT doc_id AS media_id, text AS payload, octet_length(encode(text)) AS n_bytes
  FROM documents
), grams AS (
  SELECT media_id, {h} AS h32
  FROM m, LATERAL (
    SELECT UNNEST(range(1, n_bytes - 2, 2)) AS pos
  ) r
  WHERE n_bytes >= 4
), votes AS (SELECT media_id, {votes} FROM grams GROUP BY media_id),
coded AS (SELECT media_id, {sig} AS code FROM votes),
bands AS ({band_rows}),
hot AS (
  SELECT band, val FROM bands GROUP BY band, val
  HAVING COUNT(*) BETWEEN 2 AND {band_cap}
),
keyed AS (
  SELECT b.media_id, b.code, b.band, b.val
  FROM bands b SEMI JOIN hot h ON b.band = h.band AND b.val = h.val
)
SELECT DISTINCT a.media_id AS a_id, b.media_id AS b_id,
       CAST(bit_count(xor(a.code, b.code)) AS INT) AS hamming
FROM keyed a JOIN keyed b
  ON a.band = b.band AND a.val = b.val AND a.media_id < b.media_id
WHERE bit_count(xor(a.code, b.code)) <= {max_hamming}
"""


# ---------------------------------------------------------------------------
# Media near-dup drop + apply — closes the multimodal dedup loop the
# same way the text side does (neardup_drop_list / dedup_apply): a media
# item is dropped iff it is the larger id of any SimHash-banded near-dup
# pair OR any chunk-level partial-dup pair; the kept corpus is one
# anti-join. Union of two bounded pair relations — no new pair
# computation tier.


def media_neardup_drop(
    documents: DataFrame,
    max_hamming: int = MEDIA_SIMHASH_MAX_HAMMING,
    min_shared: int = MEDIA_CHUNK_MIN_SHARED,
) -> DataFrame:
    sh = media_simhash_pairs(documents, max_hamming=max_hamming).select(
        F.col("b_id").alias("media_id")
    )
    ch = media_chunk_dedup(documents, min_shared=min_shared).select(
        F.col("b_id").alias("media_id")
    )
    return sh.unionByName(ch).dropDuplicates(["media_id"])


def media_neardup_drop_sql(
    max_hamming: int = MEDIA_SIMHASH_MAX_HAMMING,
    min_shared: int = MEDIA_CHUNK_MIN_SHARED,
) -> str:
    return f"""
WITH sh AS ({media_simhash_pairs_sql(max_hamming=max_hamming)}),
ch AS ({media_chunk_dedup_sql(min_shared=min_shared)})
SELECT DISTINCT media_id FROM (
  SELECT b_id AS media_id FROM sh
  UNION ALL
  SELECT b_id AS media_id FROM ch
)
"""


def media_dedup_apply(
    documents: DataFrame,
    max_hamming: int = MEDIA_SIMHASH_MAX_HAMMING,
    min_shared: int = MEDIA_CHUNK_MIN_SHARED,
) -> DataFrame:
    drops = media_neardup_drop(documents, max_hamming, min_shared)
    return (
        documents_as_media(documents)
        .join(drops, "media_id", "left_anti")
        .select("media_id", "media_type", "n_bytes")
    )


def media_dedup_apply_sql(
    max_hamming: int = MEDIA_SIMHASH_MAX_HAMMING,
    min_shared: int = MEDIA_CHUNK_MIN_SHARED,
) -> str:
    return f"""
WITH drops AS ({media_neardup_drop_sql(max_hamming, min_shared)}),
m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
  FROM documents
)
SELECT m.media_id, m.media_type, m.n_bytes
FROM m ANTI JOIN drops d ON m.media_id = d.media_id
"""


# ---------------------------------------------------------------------------
# Media duplication-rate report (round 9): the corpus-level headline
# metric over the chunk relation — the multimodal twin of
# text.substring_dup_rate_report. Per media type (plus an '(all)' grand
# total in the same Expand pass): how many chunk instances are duplicated
# across payloads, what fraction of stored bytes that is, and how many
# payloads are touched. Unlike the pair-generating dedup operators this
# report must NOT hot-cap: boilerplate chunks ARE the duplication being
# measured. It stays chunk-keyed end to end — chunks join their owner
# counts on chash (no pair term at any scale), one rollup aggregation.


def media_dup_rate_report(
    documents: DataFrame, chunk_bytes: int = MEDIA_CHUNK_BYTES
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6

    m = documents_as_media(documents).select(
        "media_id", "media_type", "payload", "n_bytes"
    )
    nchunks = F.greatest(
        F.ceil(F.col("n_bytes") / F.lit(chunk_bytes)).cast("int"), F.lit(1)
    )
    chunks = (
        m.select(
            "media_id",
            "media_type",
            "payload",
            F.explode(F.sequence(F.lit(0), nchunks - 1)).alias("ci"),
        )
        .select(
            "media_id",
            "media_type",
            F.md5(
                F.expr(f"substring(payload, ci * {chunk_bytes} + 1, {chunk_bytes})")
            ).alias("chash"),
        )
        .distinct()
    )
    owners = chunks.groupBy("chash").agg(F.count(F.lit(1)).alias("_own"))
    marked = chunks.join(owners, "chash").withColumn(
        "_dup", (F.col("_own") >= 2).cast("int")
    )
    n_chunks = F.count(F.lit(1)).cast("long")
    n_dup = F.sum("_dup").cast("long")
    return (
        marked.rollup("media_type")
        .agg(
            F.countDistinct("media_id").cast("long").alias("n_media"),
            n_chunks.alias("n_chunks"),
            n_dup.alias("n_dup_chunks"),
            F.countDistinct(F.when(F.col("_dup") == 1, F.col("media_id")))
            .cast("long")
            .alias("n_affected_media"),
        )
        .select(
            F.coalesce(F.col("media_type"), F.lit("(all)")).alias("media_type"),
            "n_media",
            "n_chunks",
            "n_dup_chunks",
            q6(F.col("n_dup_chunks") / F.col("n_chunks")).alias("dup_chunk_fraction"),
            "n_affected_media",
        )
    )


def media_dup_rate_report_sql(chunk_bytes: int = MEDIA_CHUNK_BYTES) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    frac = q6_sql("SUM(_dup) / COUNT(*)")
    return f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE WHEN doc_id % 3 = 0 THEN 'image'
              WHEN doc_id % 3 = 1 THEN 'audio'
              ELSE 'video' END AS media_type,
         text AS payload,
         octet_length(encode(text)) AS n_bytes
  FROM documents
), chunks AS (
  SELECT DISTINCT media_id, media_type,
         md5(substring(payload, ci * {chunk_bytes} + 1, {chunk_bytes})) AS chash
  FROM m, LATERAL (
    SELECT UNNEST(range(0, GREATEST(CAST(CEIL(n_bytes / {chunk_bytes}.0) AS INT), 1))) AS ci
  ) r
), owners AS (
  SELECT chash, COUNT(*) AS _own FROM chunks GROUP BY chash
), marked AS (
  SELECT c.media_id, c.media_type,
         CASE WHEN o._own >= 2 THEN 1 ELSE 0 END AS _dup
  FROM chunks c JOIN owners o ON c.chash = o.chash
)
SELECT COALESCE(media_type, '(all)') AS media_type,
       CAST(COUNT(DISTINCT media_id) AS BIGINT) AS n_media,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(_dup) AS BIGINT) AS n_dup_chunks,
       {frac} AS dup_chunk_fraction,
       CAST(COUNT(DISTINCT CASE WHEN _dup = 1 THEN media_id END) AS BIGINT)
         AS n_affected_media
FROM marked
GROUP BY ROLLUP(media_type)
"""
