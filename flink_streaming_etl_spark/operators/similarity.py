"""Similarity search over the ``embeddings`` table (array<float> column).

Scale design (100 TB target):
- All exact scoring runs through ONE physical pattern: **blocked all-pairs
  GEMM** — vectors are grouped into fixed-size blocks (`collect_list` per
  block id, one shuffle), block pairs are enumerated with a tiny
  blocks×blocks join, and each block pair is scored inside a vectorized
  Arrow `mapInPandas` task (numpy, float64). Work per task is
  O(block² · dim) with dense CPU math instead of per-pair interpreted
  expressions; tasks scale out linearly with the number of block pairs.
- Brute-force top-k additionally does **partial top-k inside each task**
  (per query, per corpus block) so the final global window only merges
  n_blocks·k candidates per query — the classic two-stage top-k.
- The LSH-bucketed variant cuts candidate generation itself (sign-bit
  orthant buckets → bucket-local join); it is the scale path for all-pairs
  near-dup when even blocked O(n²) is too much.

Cross-engine bit-exactness: the numpy kernel accumulates the dot product
**sequentially over dimensions** (`acc += A[:,j]·B[:,j]`, acc initialised
to 0.0) — the identical left-associated float64 summation the DuckDB oracle
performs in `list_dot_product`, so cosines match the oracle bit-for-bit;
quantization is floor(x·1e6)/1e6 (`q6`) on both sides.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_etl_spark.operators._cache import memo_persist

N_QUERIES = 10  # vec_id < 10 are the probe vectors
TOP_K = 5
BUCKET_DIMS = 6  # sign bits of the first 6 dims → 64 buckets
BLOCK_SIZE = 512  # target vectors per GEMM block

_COS_SQL = (
    "floor((list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))) * 1000000.0) / 1000000.0"
)


def _as_double(df: DataFrame) -> DataFrame:
    return df.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))


def _blocks(e: DataFrame, n_blocks: int, blk_expr=None) -> DataFrame:
    """(blk, vecs: array<struct<vec_id,v>>) — one row per block, one shuffle.
    collect_list over a struct keeps ids and vectors positionally aligned."""
    blk = blk_expr if blk_expr is not None else F.pmod(F.col("vec_id"), F.lit(n_blocks))
    return e.groupBy(blk.alias("blk")).agg(
        F.collect_list(F.struct("vec_id", "v")).alias("vecs")
    )


def _vec_helpers():
    """Numpy helpers for the Arrow kernels, defined in a nested scope so
    cloudpickle captures them BY VALUE inside each kernel closure. Kernels
    must not reference this module's globals: executor Python workers don't
    have the repo on sys.path when the driver session comes from outside
    (the driver contract in __spark_entry__.py), so a by-reference pickle
    would fail with ModuleNotFoundError on the worker."""

    def unpack(cell):
        ids = np.fromiter((d["vec_id"] for d in cell), dtype=np.int64, count=len(cell))
        V = np.stack([np.asarray(d["v"], dtype=np.float64) for d in cell])
        return ids, V

    def seq_gemm(A, B):
        # Left-associated sequential accumulation over dimensions —
        # bit-identical to the scalar fold / DuckDB list_dot_product.
        acc = np.zeros((A.shape[0], B.shape[0]))
        for j in range(A.shape[1]):
            acc += A[:, j, None] * B[None, :, j]
        return acc

    def seq_norms(A):
        acc = np.zeros(A.shape[0])
        for j in range(A.shape[1]):
            acc += A[:, j] * A[:, j]
        return np.sqrt(acc)

    def q6_np(x):
        return np.floor(x * 1000000.0) / 1000000.0

    return unpack, seq_gemm, seq_norms, q6_np


_PAIR_SCHEMA = "a_id long, b_id long, cosine double"


def _score_block_pairs(threshold: float):
    """mapInPandas kernel: rows of (vecs_a, vecs_b) → unordered pairs
    (a_id < b_id) with q6 cosine ≥ threshold."""
    unpack, seq_gemm, seq_norms, q6_np = _vec_helpers()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for row in pdf.itertuples(index=False):
                ids_a, A = unpack(row.vecs_a)
                ids_b, B = unpack(row.vecs_b)
                cos = q6_np(
                    seq_gemm(A, B) / (seq_norms(A)[:, None] * seq_norms(B)[None, :])
                )
                ii, kk = np.nonzero((cos >= threshold) & (ids_a[:, None] < ids_b[None, :]))
                if len(ii):
                    outs.append(
                        pd.DataFrame(
                            {"a_id": ids_a[ii], "b_id": ids_b[kk], "cosine": cos[ii, kk]}
                        )
                    )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame({"a_id": [], "b_id": [], "cosine": []}).astype(
                    {"a_id": "int64", "b_id": "int64", "cosine": "float64"}
                )
            )

    return fn


def _n_blocks(e: DataFrame, block_size: int) -> int:
    # One cheap count job to size the blocking; at cluster scale this is a
    # parquet-metadata scan, not a data read.
    return max(1, math.ceil(e.count() / block_size))


def embedding_neardup(
    embeddings: DataFrame, threshold: float = 0.4, block_size: int = BLOCK_SIZE
) -> DataFrame:
    """All-pairs cosine near-duplicates — exact, via blocked GEMM tasks.

    Every unordered vector pair is scored exactly once: blocks are joined on
    blk_a <= blk_b (each unordered block pair once) and the kernel keeps
    id_a < id_b (which also drops self-pairs and dedups the diagonal block).
    """
    e = _as_double(embeddings)
    g = _blocks(e, _n_blocks(e, block_size))
    bp = (
        g.alias("A")
        .join(g.alias("B"), F.col("A.blk") <= F.col("B.blk"))
        .select(
            F.col("A.vecs").alias("vecs_a"),
            F.col("B.vecs").alias("vecs_b"),
        )
    )
    # Spread block-pair rows across the cluster before the CPU-heavy kernel.
    return bp.repartition(F.rand(42)).mapInPandas(
        _score_block_pairs(threshold), _PAIR_SCHEMA
    )


def embedding_neardup_sql(threshold: float = 0.4) -> str:
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos} AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


def embedding_dedup_apply(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Semantic dedup OUTPUT: the kept vectors — keep-first over the
    cosine near-dup pairs, applied as one anti-join (the drop list is a
    small fraction of the corpus by construction, same decision shape as
    the text pipeline's :func:`dedup.dedup_apply`). At 100 TB the pair
    source swaps to the LSH/IVF candidate path; the decision stage is
    unchanged."""
    drops = (
        embedding_neardup(embeddings, threshold)
        .select(F.col("b_id").alias("vec_id"))
        .dropDuplicates(["vec_id"])
    )
    return embeddings.join(drops, "vec_id", "left_anti").select("vec_id", "label")


def embedding_dedup_apply_sql(threshold: float = 0.4) -> str:
    return f"""
WITH pairs AS ({embedding_neardup_sql(threshold)}),
drops AS (SELECT DISTINCT b_id AS vec_id FROM pairs)
SELECT e.vec_id, e.label FROM embeddings e
ANTI JOIN drops ON e.vec_id = drops.vec_id
"""


def _topk_kernel(k: int):
    """mapInPandas kernel for (query block × corpus block): per query, the
    block-local top-k by (cosine desc, neighbor_id asc). Global top-k is a
    subset of the union of block-local top-ks under the same total order, so
    the downstream window merge is exact."""
    unpack, seq_gemm, seq_norms, q6_np = _vec_helpers()

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            outs = []
            for row in pdf.itertuples(index=False):
                q_ids, Q = unpack(row.vecs_a)
                c_ids, C = unpack(row.vecs_b)
                cos = q6_np(
                    seq_gemm(Q, C) / (seq_norms(Q)[:, None] * seq_norms(C)[None, :])
                )
                for qi in range(len(q_ids)):
                    mask = c_ids != q_ids[qi]
                    scores, nbrs = cos[qi][mask], c_ids[mask]
                    order = np.lexsort((nbrs, -scores))[:k]
                    outs.append(
                        pd.DataFrame(
                            {
                                "query_id": np.full(len(order), q_ids[qi]),
                                "neighbor_id": nbrs[order],
                                "cos": scores[order],
                            }
                        )
                    )
            yield (
                pd.concat(outs)
                if outs
                else pd.DataFrame({"query_id": [], "neighbor_id": [], "cos": []}).astype(
                    {"query_id": "int64", "neighbor_id": "int64", "cos": "float64"}
                )
            )

    return fn


def cosine_topk(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    block_size: int = BLOCK_SIZE,
) -> DataFrame:
    """Brute-force cosine top-k for the probe set (baseline ANN): the tiny
    query set rides along as a single block crossed with every corpus block;
    each task emits its block-local top-k, the final window merges them."""
    e = _as_double(embeddings)
    q = _blocks(e.filter(F.col("vec_id") < n_queries), 1, blk_expr=F.lit(0)).select(
        F.col("vecs").alias("vecs_a")
    )
    g = _blocks(e, _n_blocks(e, block_size)).select(F.col("vecs").alias("vecs_b"))
    bp = q.crossJoin(g)
    partial = bp.repartition(F.rand(42)).mapInPandas(
        _topk_kernel(k), "query_id long, neighbor_id long, cos double"
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        partial.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", F.col("cos").alias("cosine"))
    )


def cosine_topk_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    cos = _COS_SQL.format(a="q.v", b="e.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, v FROM e WHERE vec_id < {n_queries}),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {cos} AS cos
  FROM q JOIN e ON e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cos AS cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {k}
"""


def _bucket_expr_spark(n_planes: int = BUCKET_DIMS) -> F.Column:
    return F.concat(
        *[
            F.when(F.element_at(F.col("v"), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(n_planes)
        ]
    )


def ann_lsh_bucketed(
    embeddings: DataFrame, threshold: float = 0.1, n_planes: int = BUCKET_DIMS
) -> DataFrame:
    """Sign-bit LSH: bucket on the signs of the first ``n_planes``
    components, then exact cosine only within buckets (vectors in the same
    orthant are the high-cosine candidates). The scale path: candidate
    volume drops ~|buckets|× before any scoring; the bucket-local join is
    AQE-skew-handled when orthant populations are uneven.

    ``n_planes`` is the corpus-growth dial: in-bucket candidate pairs grow
    as (n/2^p)² per bucket, so every extra plane buys back a 4× candidate
    blow-up from a 2× corpus at ~halved per-bucket recall mass — grow p
    logarithmically with n (measured in SCALE.md §Measured scaling: fixed
    p=6 at 10× corpus → 4.2× runtime; the fix is p+=3)."""
    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    e = _as_double(embeddings).withColumn(
        "bucket", _bucket_expr_spark(n_planes)
    ).withColumn("norm", vec_norm(F.col("v")))
    a = e.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"), F.col("norm").alias("na"), "bucket")
    b = e.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"), F.col("norm").alias("nb"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", "bucket",
            q6(vec_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ann_lsh_bucketed_sql(threshold: float = 0.1) -> str:
    bucket = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(BUCKET_DIMS)
    )
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket
  FROM embeddings
)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.bucket AS bucket, {cos} AS cosine
FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN: coarse-quantize the corpus into centroid cells,
# search only the query's closest cells.

N_CENTROIDS = 16
N_PROBE = 4


def _coarse_assign(ev: DataFrame, cents: DataFrame, n_queries: int, n_probe: int):
    """Shared IVF coarse quantizer: (assign, probes).

    ``assign`` (every vector → its nearest centroid cell) is computed with a
    partial-aggregating ``groupBy(vec_id).agg(max_by(...))`` argmax, NOT a
    window: ``row_number() OVER (PARTITION BY vec_id)`` would ship the full
    n·n_centroids cross relation through the exchange (window functions get
    no map-side combine), a centroid-count× larger shuffle than needed on
    the hottest relation in the ANN family. ``max_by`` collapses each
    vector's candidate rows map-side, so the exchange carries one row per
    vector. Ordering struct (ccos, -cent_id) reproduces the window's
    deterministic ``ORDER BY ccos DESC, cent_id`` tie-break exactly.

    ``probes`` (each query's n_probe closest cells) still uses the window —
    but only over the n_queries-sized slice, filtered before the window so
    the corpus never reaches it.

    ``ev`` must carry (vec_id, v, norm); ``cents`` (cent_id, cv, cnorm).
    assign returns (vec_id, cent_id, v, norm); probes returns every scored
    column plus rn ≤ n_probe for callers to project."""
    from flink_streaming_etl_spark.functions import q6, vec_dot

    ccos = q6(vec_dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm")))
    scored_cent = ev.join(F.broadcast(cents), how="cross").withColumn("ccos", ccos)
    order = F.struct(F.col("ccos").alias("c"), (-F.col("cent_id")).alias("nc"))
    assign = (
        scored_cent.groupBy("vec_id")
        .agg(
            F.max_by(
                F.struct(F.col("cent_id"), F.col("v"), F.col("norm")), order
            ).alias("best")
        )
        .select(
            "vec_id",
            F.col("best.cent_id").alias("cent_id"),
            F.col("best.v").alias("v"),
            F.col("best.norm").alias("norm"),
        )
    )
    w_assign = Window.partitionBy("vec_id").orderBy(F.col("ccos").desc(), F.col("cent_id"))
    probes = (
        scored_cent.filter(F.col("vec_id") < n_queries)
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") <= n_probe)
    )
    return assign, probes


def ann_ivf(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> DataFrame:
    """IVF index + probe search, end to end:

    1. centroids := a fixed deterministic subset of the corpus (vec_ids
       [n_queries, n_queries + n_centroids) — the stand-in for a k-means
       codebook, which would be trained offline at scale);
    2. every vector is assigned to its nearest centroid (broadcast the tiny
       centroid set, argmax by q6 cosine with id tiebreak) — builds the
       inverted file, one shuffle;
    3. each query probes only its ``n_probe`` closest cells: candidates =
       inverted-file members of those cells (~n·n_probe/n_centroids of the
       corpus), scored exactly, block top-k per query.

    Candidate volume — not scoring — is what drops ×(n_centroids/n_probe)
    vs brute force; recall tradeoff is measured against cosine_topk in
    tests/test_extensions.py."""
    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    e = _as_double(embeddings).withColumn("norm", vec_norm(F.col("v")))
    cents = e.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    assign, probe_rows = _coarse_assign(e, cents, n_queries, n_probe)
    probes = probe_rows.select(
        F.col("vec_id").alias("query_id"), F.col("cent_id"),
        F.col("v").alias("qv"), F.col("norm").alias("qnorm"),
    )
    # probes is n_queries×n_probe rows — broadcast it; a shuffle join on
    # cent_id would hash-partition the corpus across only n_centroids keys
    # (guaranteed skew at scale).
    cand = F.broadcast(probes).join(assign, "cent_id").filter(
        F.col("vec_id") != F.col("query_id")
    )
    pair_cos = q6(vec_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), pair_cos.alias("cosine")
    ).dropDuplicates(["query_id", "neighbor_id"])
    w_top = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ann_ivf_sql(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
) -> str:
    ccos = _COS_SQL.format(a="e.v", b="c.cv")
    qcos = _COS_SQL.format(a="p.qv", b="a.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM e
  WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_centroids}
),
scored_cent AS (
  SELECT e.vec_id, e.v, c.cent_id, {ccos} AS ccos,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY {ccos} DESC, c.cent_id) AS rn
  FROM e, cents c
),
assign AS (SELECT vec_id, cent_id, v FROM scored_cent WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id, v AS qv
  FROM scored_cent WHERE vec_id < {n_queries} AND rn <= {n_probe}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id AS neighbor_id, {qcos} AS cosine
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rn
  FROM cand
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# K-means codebook training (Lloyd) — the offline step a production IVF
# index uses instead of ann_ivf's fixed corpus-subset centroids.


def kmeans_assign(
    embeddings: DataFrame,
    k: int = N_CENTROIDS,
    n_iter: int = 5,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """Lloyd's k-means over the embedding corpus, returning the final
    (vec_id, centroid_idx, cosine-to-centroid) assignment.

    Deterministic init: centroids seeded from vec_ids [n_queries,
    n_queries+k). Each iteration = broadcast the k centroids, one argmax
    assignment pass over the corpus, one groupBy(centroid) mean — the
    standard distributed Lloyd step (work O(n·k·dim) map-side + a k-row
    shuffle). Iterative ⇒ rows-only driver check; the monotone-inertia
    property is tested in tests/test_extensions.py."""
    e = _as_double(embeddings).withColumn("norm", vec_norm_col())
    corpus = e.select("vec_id", "v", "norm")

    def assign_to(cents_df: DataFrame) -> DataFrame:
        cents = F.broadcast(cents_df)
        scored = corpus.join(cents)
        from flink_streaming_etl_spark.functions import q6, vec_dot

        cos = q6(vec_dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm")))
        w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cidx"))
        return (
            scored.withColumn("cos", cos)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("vec_id", "v", F.col("cidx").alias("centroid_idx"), F.col("cos"))
        )

    def centroid_frame(df: DataFrame) -> DataFrame:
        # normalize mean vectors so the cosine argmax stays scale-free
        from flink_streaming_etl_spark.functions import vec_norm

        return df.select(
            F.col("cidx"), F.col("cv"), vec_norm(F.col("cv")).alias("cnorm")
        ).filter(F.col("cnorm") > 0)

    init = (
        e.filter((F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + k))
        .select(
            (F.col("vec_id") - n_queries).alias("cidx"),
            F.col("v").alias("cv"),
        )
    )
    cents = centroid_frame(init).localCheckpoint(eager=True)
    assigned = assign_to(cents)
    for _ in range(n_iter):
        # new centroid = element-wise mean of member vectors (posexplode +
        # groupBy(cidx, dim) keeps the shuffle at k·dim rows)
        means = (
            assigned.select("centroid_idx", F.posexplode("v").alias("j", "x"))
            .groupBy("centroid_idx", "j")
            .agg(F.avg("x").alias("m"))
            .groupBy("centroid_idx")
            .agg(F.array_sort(F.collect_list(F.struct("j", "m"))).alias("jm"))
            .select(
                F.col("centroid_idx").alias("cidx"),
                F.expr("transform(jm, p -> p.m)").alias("cv"),
            )
        )
        cents = centroid_frame(means).localCheckpoint(eager=True)
        assigned = assign_to(cents)
    return assigned.select("vec_id", "centroid_idx", F.col("cos").alias("cosine"))


def kmeans_assign_pinned(
    embeddings: DataFrame, k: int = N_CENTROIDS, n_queries: int = N_QUERIES
) -> DataFrame:
    """Driver-hashable oracle twin of ``kmeans_assign``: the Lloyd
    ASSIGNMENT step against pinned centroids (the embedding rows with
    vec_id in [n_queries, n_queries+k) — exactly ``kmeans_assign``'s
    deterministic init, iteration 0). Same physical shape as one k-means
    iteration — broadcast k centroids, one argmax pass over the corpus —
    but fully SQL-expressible, so the iterative operator's core kernel
    gets an exact cross-engine value check."""
    from flink_streaming_etl_spark.functions import q6, vec_dot

    e = _as_double(embeddings).withColumn("norm", vec_norm_col())
    cents = (
        e.filter((F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + k))
        .select(
            (F.col("vec_id") - n_queries).alias("centroid_idx"),
            F.col("v").alias("cv"),
            F.col("norm").alias("cnorm"),
        )
    )
    cos = q6(vec_dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm")))
    scored = e.join(F.broadcast(cents)).withColumn("cos", cos)
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("centroid_idx"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_idx", F.col("cos").alias("cosine"))
    )


def kmeans_assign_pinned_sql(k: int = N_CENTROIDS, n_queries: int = N_QUERIES) -> str:
    cos = _COS_SQL.format(a="e.v", b="c.cv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id - {n_queries} AS centroid_idx, v AS cv FROM e
      WHERE vec_id >= {n_queries} AND vec_id < {n_queries + k}),
scored AS (SELECT e.vec_id, c.centroid_idx, {cos} AS cos FROM e, c)
SELECT vec_id, centroid_idx, cos AS cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, centroid_idx) AS rn
  FROM scored
) WHERE rn = 1
"""


def vec_norm_col():
    from flink_streaming_etl_spark.functions import vec_norm

    return vec_norm(F.col("v"))


# ---------------------------------------------------------------------------
# Per-group standardization via groupBy().applyInPandas — the split-apply-
# combine Pandas surface (group fits in one Arrow batch by construction).


def standardize_by_label(embeddings: DataFrame) -> DataFrame:
    """Standardize embeddings within each label group ((x-mean)/std per
    dimension) — the per-slice feature-normalization stage. One shuffle on
    label; each group is processed as a single Arrow batch, so group size
    must fit an executor (guard: repartition by a composite key or switch
    to a two-pass agg+join formulation for giant groups)."""

    def norm_group(pdf):
        import numpy as np
        import pandas as pd

        V = np.stack(pdf["v"].map(np.asarray))
        mu = V.mean(axis=0)
        sd = V.std(axis=0)
        sd[sd == 0] = 1.0
        Z = (V - mu) / sd
        return pd.DataFrame(
            {
                "vec_id": pdf["vec_id"],
                "label": pdf["label"],
                "z": list(Z),
            }
        )

    e = embeddings.select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("v")
    )
    return e.groupBy("label").applyInPandas(
        norm_group, "vec_id long, label int, z array<double>"
    )


def standardize_by_label_stats(embeddings: DataFrame) -> DataFrame:
    """Driver-hashable twin of ``standardize_by_label``: runs the SAME
    applyInPandas z-score kernel, then projects each z vector to scalars
    (L2 norm + mean). Quantized with round-half-even at 1e-4 on BOTH
    engines (bround / round_even) rather than 1e-6 floor: the two sides
    accumulate floats in different orders (numpy pairwise vs SQL
    sequential), so ulp-level noise must not be able to straddle a
    quantization boundary — coarsening the grid 100x makes a boundary hit
    correspondingly unlikely where floor-at-1e-6 was one ulp away."""
    z = standardize_by_label(embeddings)
    dim = F.size("z")
    z_norm = F.bround(F.sqrt(F.aggregate("z", F.lit(0.0), lambda acc, x: acc + x * x)), 4)
    z_mean = F.bround(F.aggregate("z", F.lit(0.0), lambda acc, x: acc + x) / dim, 4)
    return z.select("vec_id", "label", z_norm.alias("z_norm"), z_mean.alias("z_mean"))


STANDARDIZE_BY_LABEL_STATS_SQL = """
WITH flat AS (
  SELECT vec_id, label,
         unnest(embedding::DOUBLE[]) AS x,
         generate_subscripts(embedding::DOUBLE[], 1) AS dim
  FROM embeddings
),
stats AS (
  SELECT label, dim, AVG(x) AS mu,
         CASE WHEN STDDEV_POP(x) = 0 THEN 1.0 ELSE STDDEV_POP(x) END AS sd
  FROM flat GROUP BY 1, 2
),
z AS (
  SELECT f.vec_id, f.label, (f.x - s.mu) / s.sd AS zx
  FROM flat f JOIN stats s ON f.label = s.label AND f.dim = s.dim
)
SELECT vec_id, label,
       round_even(sqrt(SUM(zx * zx)), 4) AS z_norm,
       round_even(SUM(zx) / COUNT(*), 4) AS z_mean
FROM z GROUP BY 1, 2
"""


def planes_for_corpus(n_vectors: int, target_bucket_size: int = 100) -> int:
    """The ann_lsh_bucketed corpus-growth dial, operationalized: the number
    of sign planes that keeps expected orthant occupancy ≈
    ``target_bucket_size`` (so in-bucket exact scoring stays
    O(n · target²/target) instead of quadratic in the corpus).

    p = ceil(log2(n / target)): every corpus doubling adds one plane,
    which quarters the per-bucket pair count back to where it was.
    Measured (SCALE.md §Measured scaling): fixed p=6 at a 10x corpus →
    262x runtime; p=9 per this dial restores near-linear behavior.
    """
    import math

    if n_vectors <= target_bucket_size:
        return 1
    return max(1, math.ceil(math.log2(n_vectors / target_bucket_size)))


def quantize_embeddings(embeddings: DataFrame) -> DataFrame:
    """Int8 scalar quantization of the embedding corpus — the memory-prep
    stage before an ANN index ships (float32 → uint8 cuts the vector store
    4×). Per-dimension min/max (one tiny dims-keyed agg, broadcast back),
    code = floor((x - min) / ((max - min)/255)) capped at 255.

    Output is deliberately integer-only (per-vector code checksum/min/max)
    so the driver hash and the SQL oracle compare EXACTLY: min/max are
    order-insensitive, and each code is a per-value IEEE computation
    identical in any engine — no float summation anywhere.

    Scale: the dims relation is |dims| rows (constant), broadcast to the
    corpus scan; the per-vector rollup shuffles vec-keyed rows once.
    """
    e = _as_double(embeddings)
    dims = e.select("vec_id", F.posexplode("v").alias("j", "x"))
    stats = dims.groupBy("j").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    scale = (F.col("mx") - F.col("mn")) / F.lit(255.0)
    code = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(F.lit(255), F.floor((F.col("x") - F.col("mn")) / scale))
    ).cast("long")
    coded = dims.join(F.broadcast(stats), "j").select(
        "vec_id", "j", code.alias("code")
    )
    return (
        coded.groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dims"),
            F.sum(F.col("code") * (F.col("j") + 1)).cast("long").alias("code_checksum"),
            F.min("code").cast("long").alias("code_min"),
            F.max("code").cast("long").alias("code_max"),
        )
    )


QUANTIZE_EMBEDDINGS_SQL = """
WITH dims AS (
  SELECT vec_id,
         generate_subscripts(embedding::DOUBLE[], 1) AS j,
         unnest(embedding::DOUBLE[]) AS x
  FROM embeddings
),
stats AS (SELECT j, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY 1),
coded AS (
  SELECT d.vec_id, d.j,
         CASE WHEN s.mx = s.mn THEN 0
              ELSE least(255, CAST(floor((d.x - s.mn) / ((s.mx - s.mn) / 255.0)) AS BIGINT))
         END AS code
  FROM dims d JOIN stats s ON d.j = s.j
)
SELECT vec_id,
       COUNT(*) AS n_dims,
       CAST(SUM(code * j) AS BIGINT) AS code_checksum,
       MIN(code) AS code_min,
       MAX(code) AS code_max
FROM coded GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Product quantization (Jégou et al. 2011, public paper) with a PINNED
# deterministic codebook, the same pinning device as kmeans_assign_pinned:
# centroids are the subvectors of vec_id in [N_QUERIES, N_QUERIES + k), so
# the operator is reproducible and the oracle can recompute it exactly.
# Scale shape: the codebook is m*k tiny rows broadcast to the corpus scan;
# each vector fans out to m subvectors and m*k scored rows (constant
# factor), then one vec-keyed aggregation emits the code word — linear in
# the corpus, no iterative training inside the operator. Distances are
# floor-quantized at 1e-6 before the argmin and ties break on centroid
# index (kmeans_assign_pinned precedent), so the integer-only output is
# engine-exact.

PQ_M = 4  # subspaces; embedding dim must divide evenly (64 -> 16 dims each)


def pq_encode(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = N_CENTROIDS,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6

    e = _as_double(embeddings)
    d_sub = (F.size("v") / m).cast("int")
    subs = e.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice("v", s * d_sub + 1, d_sub),
            )
        ).alias("sub_idx", "sv"),
    )
    cents = subs.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + k)
    ).select(
        (F.col("vec_id") - n_queries).cast("int").alias("centroid_idx"),
        "sub_idx",
        F.col("sv").alias("cv"),
    )
    dist2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = subs.join(F.broadcast(cents), "sub_idx").select(
        "vec_id", "sub_idx", "centroid_idx", q6(dist2).alias("qd")
    )
    best = (
        scored.groupBy("vec_id", "sub_idx")
        .agg(F.min(F.struct("qd", "centroid_idx")).alias("_b"))
        .select("vec_id", "sub_idx", F.col("_b")["centroid_idx"].alias("code"))
    )
    code_cols = [
        F.max(F.when(F.col("sub_idx") == s, F.col("code")))
        .cast("long")
        .alias(f"code_{s}")
        for s in range(m)
    ]
    return best.groupBy("vec_id").agg(*code_cols)


def pq_encode_sql(
    m: int = PQ_M, k: int = N_CENTROIDS, n_queries: int = N_QUERIES
) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    qd = q6_sql(
        "list_sum(list_transform(range(1, len(u.sv) + 1),"
        " i -> (u.sv[i] - c.cv[i]) * (u.sv[i] - c.cv[i])))"
    )
    codes = ",\n       ".join(
        f"CAST(MAX(CASE WHEN sub_idx = {s} THEN centroid_idx END) AS BIGINT) AS code_{s}"
        for s in range(m)
    )
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
subs AS (
  SELECT vec_id, sub_idx,
         list_slice(v, sub_idx * (len(v) // {m}) + 1,
                       (sub_idx + 1) * (len(v) // {m})) AS sv
  FROM e, (SELECT unnest(range(0, {m})) AS sub_idx)
),
cents AS (
  SELECT vec_id - {n_queries} AS centroid_idx, sub_idx, sv AS cv
  FROM subs WHERE vec_id >= {n_queries} AND vec_id < {n_queries + k}
),
scored AS (
  SELECT u.vec_id, u.sub_idx, c.centroid_idx, {qd} AS qd
  FROM subs u JOIN cents c ON u.sub_idx = c.sub_idx
),
best AS (
  SELECT vec_id, sub_idx, centroid_idx,
         row_number() OVER (PARTITION BY vec_id, sub_idx
                            ORDER BY qd, centroid_idx) AS rn
  FROM scored
)
SELECT vec_id,
       {codes}
FROM best WHERE rn = 1 GROUP BY vec_id
"""


# ---------------------------------------------------------------------------
# ANN quality gauge as a first-class query: recall@k of the IVF probe
# search against the exact brute-force top-k, per probe vector. Both sides
# are fully deterministic (q6-quantized scores, id tie-breaks), so the
# report is engine-exact and oracle-checkable — an index-quality dashboard
# a vector-store team watches when they tune n_probe / n_centroids. Scale:
# both inputs are top-k relations (n_queries*k rows); everything here is
# driver-sized, the heavy lifting happened (and was already scale-shaped)
# in the two operators being compared.


def ann_recall_report(
    embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6

    exact = cosine_topk(embeddings, k, n_queries)
    approx = ann_ivf(embeddings, k, n_queries)
    hits = (
        exact.join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "leftsemi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_hits"))
    )
    allq = exact.select("query_id").dropDuplicates()
    n_hits = F.coalesce("n_hits", F.lit(0)).cast("long")
    return allq.join(hits, "query_id", "left").select(
        "query_id",
        n_hits.alias("n_hits"),
        F.lit(k).cast("long").alias("k"),
        q6(n_hits / F.lit(float(k))).alias("recall"),
    )


def ann_recall_report_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    rec = q6_sql(f"(COALESCE(h.n_hits, 0) / {float(k)})")
    return f"""
WITH exact AS ({cosine_topk_sql(k, n_queries)}),
approx AS ({ann_ivf_sql(k, n_queries)}),
hits AS (
  SELECT e.query_id, COUNT(*) AS n_hits
  FROM exact e JOIN approx a
    ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
  GROUP BY 1
)
SELECT q.query_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST({k} AS BIGINT) AS k,
       {rec} AS recall
FROM (SELECT DISTINCT query_id FROM exact) q
LEFT JOIN hits h ON q.query_id = h.query_id
"""


# ---------------------------------------------------------------------------
# IVF-PQ: the canonical billion-scale vector-store layout (Jégou et al.
# 2011) end to end — coarse IVF cells prune candidates, PQ code words
# stand in for the vectors, and queries score candidates through an
# asymmetric-distance (ADC) lookup table instead of touching raw floats.
# Memory story at scale: the search set holds 8-bit codes (m bytes/vector)
# plus one tiny codebook; the raw corpus is only read to build codes.
# Everything is deterministic (pinned codebook, q6-quantized table
# entries, fixed left-to-right subspace summation, id tie-breaks), so the
# approximate result itself is oracle-exact. Scale shape: the ADC table is
# n_queries·m·k rows broadcast once; candidate volume is the IVF
# n_probe/n_centroids fraction; per-candidate scoring is m integer array
# lookups + (m-1) additions.


def ann_ivf_pq(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6, vec_norm

    e = _as_double(embeddings)

    # -- coarse quantizer: identical assignment/probe logic to ann_ivf
    ev = e.withColumn("norm", vec_norm(F.col("v")))
    coarse = ev.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    assign_full, probe_rows = _coarse_assign(ev, coarse, n_queries, n_probe)
    assign = assign_full.select("vec_id", "cent_id")
    probes = probe_rows.select(F.col("vec_id").alias("query_id"), "cent_id")

    # -- fine quantizer: corpus PQ codes + per-query ADC lookup arrays
    codes = pq_encode(embeddings, m, n_centroids, n_queries)
    d_sub = (F.size("v") / m).cast("int")
    subs = e.select(
        "vec_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice("v", s * d_sub + 1, d_sub),
            )
        ).alias("sub_idx", "sv"),
    )
    pq_cents = subs.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        (F.col("vec_id") - n_queries).cast("int").alias("centroid_idx"),
        "sub_idx",
        F.col("sv").alias("cv"),
    )
    dist2 = F.aggregate(
        F.zip_with("sv", "cv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    adc = (
        subs.filter(F.col("vec_id") < n_queries)
        .join(F.broadcast(pq_cents), "sub_idx")
        .select(
            F.col("vec_id").alias("query_id"),
            "sub_idx",
            "centroid_idx",
            q6(dist2).alias("d"),
        )
    )
    # pivot the table to one row per query: d{s} = distances ordered by
    # centroid_idx, so element_at(d_s, code_s + 1) is the lookup
    adc_wide = (
        adc.groupBy("query_id")
        .pivot("sub_idx", list(range(m)))
        .agg(
            F.array_sort(F.collect_list(F.struct("centroid_idx", "d"))).alias("_t")
        )
        .select(
            "query_id",
            *[
                F.transform(F.col(str(s)), lambda t: t["d"]).alias(f"d{s}")
                for s in range(m)
            ],
        )
    )

    # -- search: IVF candidates scored through the broadcast ADC arrays
    cand = (
        F.broadcast(probes).join(assign, "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
        .join(codes, "vec_id")
        .join(F.broadcast(adc_wide), "query_id")
    )
    total = F.element_at(F.col("d0"), F.col("code_0").cast("int") + 1)
    for s in range(1, m):
        total = total + F.element_at(F.col(f"d{s}"), F.col(f"code_{s}").cast("int") + 1)
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), total.alias("adc_dist")
    )
    w_top = Window.partitionBy("query_id").orderBy(F.col("adc_dist").asc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_dist")
    )


def ann_ivf_pq_sql(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    ccos = _COS_SQL.format(a="e.v", b="c.cv")
    qd = q6_sql(
        "list_sum(list_transform(range(1, len(q.sv) + 1),"
        " i -> (q.sv[i] - c.cv[i]) * (q.sv[i] - c.cv[i])))"
    )
    code_joins = "\n  ".join(
        f"JOIN adc a{s} ON a{s}.query_id = cand.query_id AND a{s}.sub_idx = {s}"
        f" AND a{s}.centroid_idx = kc.code_{s}"
        for s in range(m)
    )
    total = " + ".join(f"a{s}.d" for s in range(m))
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM e
  WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_centroids}
),
scored_cent AS (
  SELECT e.vec_id, c.cent_id, {ccos} AS ccos,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY {ccos} DESC, c.cent_id) AS rn
  FROM e, cents c
),
assign AS (SELECT vec_id, cent_id FROM scored_cent WHERE rn = 1),
probes AS (
  SELECT vec_id AS query_id, cent_id
  FROM scored_cent WHERE vec_id < {n_queries} AND rn <= {n_probe}
),
subs AS (
  SELECT vec_id, sub_idx,
         list_slice(v, sub_idx * (len(v) // {m}) + 1,
                       (sub_idx + 1) * (len(v) // {m})) AS sv
  FROM e, (SELECT unnest(range(0, {m})) AS sub_idx)
),
pq_cents AS (
  SELECT vec_id - {n_queries} AS centroid_idx, sub_idx, sv AS cv
  FROM subs WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_centroids}
),
codes AS ({pq_encode_sql(m, n_centroids, n_queries)}),
adc AS (
  SELECT q.vec_id AS query_id, q.sub_idx, c.centroid_idx, {qd} AS d
  FROM subs q JOIN pq_cents c ON q.sub_idx = c.sub_idx
  WHERE q.vec_id < {n_queries}
),
cand AS (
  SELECT DISTINCT p.query_id, a.vec_id
  FROM probes p JOIN assign a ON p.cent_id = a.cent_id AND a.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id AS neighbor_id, {total} AS adc_dist
  FROM cand
  JOIN codes kc ON kc.vec_id = cand.vec_id
  {code_joins}
)
SELECT query_id, neighbor_id, adc_dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_dist ASC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# SemDeDup (Abbas et al. 2023, arXiv:2303.09540, public): semantic
# deduplication for pretraining corpora — cluster the embedding space
# coarsely, then compare pairs ONLY within a cluster. Clustering is what
# makes semantic dedup tractable at corpus scale: candidate generation is
# O(sum of cluster_size^2) instead of O(n^2), and each cluster's pair
# relation shuffles on its own cell key. Centroids are the same pinned
# corpus subset as ann_ivf (a k-means codebook would be trained offline at
# scale); the coarse assignment reuses _coarse_assign's partial-aggregating
# argmax. Drop rule (deterministic, oracle-exact): a vector is dropped iff
# a LOWER-id vector in the same cell has q6-cosine >= threshold with it —
# the id order stands in for the paper's keep-one-per-eps-group choice.

SEMDEDUP_THRESHOLD = 0.4


def semdedup_drop(
    embeddings: DataFrame,
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int = N_CENTROIDS,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    """(vec_id, cell, dropped) for every corpus vector.

    ``n_centroids`` is the corpus-growth dial: within-cell pair volume is
    ~n²/C, so C must grow linearly with the corpus to keep cells at a
    constant size — size it with :func:`centroids_for_corpus` (measured in
    SCALE.md: fixed C=16 at a 10× corpus → 8.0×; the dial restores
    near-linear)."""
    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    ev = _as_double(embeddings).withColumn("norm", vec_norm(F.col("v")))
    cents = ev.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    # The assignment relation IS the IVF index: it feeds both sides of the
    # within-cell pair join plus the final drop join — persist it so the
    # coarse argmax (the corpus-sized stage) runs once instead of three
    # times. A production system materializes exactly this relation.
    assign, _ = _coarse_assign(ev, cents, n_queries=0, n_probe=1)
    assign = assign.persist()
    a = assign.select(
        F.col("vec_id").alias("a_id"), F.col("cent_id"),
        F.col("v").alias("va"), F.col("norm").alias("na"),
    )
    b = assign.select(
        F.col("vec_id").alias("b_id"), F.col("cent_id"),
        F.col("v").alias("vb"), F.col("norm").alias("nb"),
    )
    pair_cos = q6(vec_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")))
    dropped = (
        a.join(b, "cent_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(pair_cos >= threshold)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(True))
    )
    return (
        assign.join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cent_id").cast("long").alias("cell"),
            F.coalesce("_d", F.lit(False)).alias("dropped"),
        )
    )


def semdedup_drop_sql(
    threshold: float = SEMDEDUP_THRESHOLD,
    n_centroids: int = N_CENTROIDS,
    n_queries: int = N_QUERIES,
) -> str:
    ccos = _COS_SQL.format(a="e.v", b="c.cv")
    pcos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM e
  WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_centroids}
),
assign AS (
  SELECT vec_id, cent_id, v FROM (
    SELECT e.vec_id, c.cent_id, e.v,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {ccos} DESC, c.cent_id) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assign a JOIN assign b
    ON a.cent_id = b.cent_id AND a.vec_id < b.vec_id
  WHERE {pcos} >= {threshold}
)
SELECT s.vec_id,
       CAST(s.cent_id AS BIGINT) AS cell,
       (d.vec_id IS NOT NULL) AS dropped
FROM assign s LEFT JOIN dropped d ON s.vec_id = d.vec_id
"""


# ---------------------------------------------------------------------------
# Cluster balance report — the curation-side health check on the same
# pinned-centroid clustering: per cell, how many vectors, how tight the
# cell is (mean q6 cosine-to-centroid, decimal-summed for order
# independence), and the label purity (modal label share). The operator a
# data curator runs after any clustering step to find degenerate cells
# before sampling from them.


def cluster_balance_report(
    embeddings: DataFrame,
    n_centroids: int = N_CENTROIDS,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    ev = _as_double(embeddings).withColumn("norm", vec_norm(F.col("v")))
    cents = ev.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    ccos = q6(vec_dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm")))
    scored_cent = ev.join(F.broadcast(cents), how="cross").withColumn("ccos", ccos)
    order = F.struct(F.col("ccos").alias("c"), (-F.col("cent_id")).alias("nc"))
    # argmax first (partial-aggregating max_by, see _coarse_assign), THEN
    # join labels onto the one-row-per-vector result — the label column
    # never rides the n·n_centroids cross relation.
    assign = (
        scored_cent.groupBy("vec_id")
        .agg(F.max_by(F.struct("cent_id", "ccos"), order).alias("best"))
        .select(
            "vec_id",
            F.col("best.cent_id").alias("cell"),
            F.col("best.ccos").alias("ccos"),
        )
        .join(embeddings.select("vec_id", "label"), "vec_id")
    )
    by_label = assign.groupBy("cell", "label").agg(F.count(F.lit(1)).alias("nl"))
    top_label = (
        by_label.groupBy("cell")
        .agg(
            F.max_by(
                F.struct("label", "nl"),
                F.struct(F.col("nl"), (-F.col("label")).alias("neg")),
            ).alias("t")
        )
        .select(
            "cell",
            F.col("t.label").alias("top_label"),
            F.col("t.nl").alias("top_label_n"),
        )
    )
    per_cell = assign.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        # ccos values are q6-quantized (1e-6 grid): DECIMAL(26,6) summation
        # is exact and order-independent; the final divide runs in double.
        (
            F.sum(F.col("ccos").cast("decimal(26,6)")).cast("double")
            / F.count(F.lit(1))
        ).alias("_m"),
    )
    return (
        per_cell.join(top_label, "cell")
        .select(
            F.col("cell").cast("long").alias("cell"),
            "n_vectors",
            q6(F.col("_m")).alias("mean_cos_to_centroid"),
            F.col("top_label").cast("long").alias("top_label"),
            "top_label_n",
            q6(F.col("top_label_n") / F.col("n_vectors")).alias("purity"),
        )
    )


def cluster_balance_report_sql(
    n_centroids: int = N_CENTROIDS, n_queries: int = N_QUERIES
) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    ccos = _COS_SQL.format(a="e.v", b="c.cv")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM e
  WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_centroids}
),
assign AS (
  SELECT vec_id, cent_id AS cell, ccos, label FROM (
    SELECT e.vec_id, c.cent_id, e.label,
           {ccos} AS ccos,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {ccos} DESC, c.cent_id) AS rn
    FROM e, cents c
  ) WHERE rn = 1
),
by_label AS (
  SELECT cell, label, COUNT(*) AS nl FROM assign GROUP BY 1, 2
),
top_label AS (
  SELECT cell, label AS top_label, nl AS top_label_n FROM (
    SELECT *, row_number() OVER (PARTITION BY cell
                                 ORDER BY nl DESC, label ASC) AS rn
    FROM by_label
  ) WHERE rn = 1
),
per_cell AS (
  SELECT cell, COUNT(*) AS n_vectors,
         CAST(SUM(CAST(ccos AS DECIMAL(26,6))) AS DOUBLE) / COUNT(*) AS m
  FROM assign GROUP BY 1
)
SELECT CAST(p.cell AS BIGINT) AS cell,
       p.n_vectors,
       {q6_sql("p.m")} AS mean_cos_to_centroid,
       CAST(t.top_label AS BIGINT) AS top_label,
       t.top_label_n,
       {q6_sql("t.top_label_n / CAST(p.n_vectors AS DOUBLE)")} AS purity
FROM per_cell p JOIN top_label t USING (cell)
"""


# ---------------------------------------------------------------------------
# Residual PQ — the encoding IVF-PQ actually ships (Jégou et al. 2011 §III):
# quantize the RESIDUAL v − c(cell) rather than the raw vector, so one shared
# subspace codebook only has to cover the (much tighter) within-cell
# displacement distribution instead of the whole space. Codebook: the
# residuals of a pinned, coarse-disjoint corpus subset
# (vec_ids [n_queries+n_centroids, n_queries+n_centroids+k)) — the stand-in
# for the offline-trained residual codebook, same convention as the pinned
# coarse centroids. Everything stays deterministic: residuals are exact IEEE
# subtractions on identical inputs, sub-distances are q6-floored before the
# argmin, ties break on code index — so the integer code words are
# engine-exact. Scale shape identical to pq_encode: constant m·k fan-out per
# vector, one vec-keyed rollup, broadcast codebook.

PQ_RESIDUAL_CODES = 16  # codebook entries per subspace


def _residual_relation(
    embeddings: DataFrame, n_centroids: int, n_queries: int
) -> DataFrame:
    """(vec_id, cell, r): every vector's coarse cell + residual to its
    centroid. Reuses the partial-aggregating argmax coarse assignment."""
    from flink_streaming_etl_spark.functions import vec_norm

    ev = _as_double(embeddings).withColumn("norm", vec_norm(F.col("v")))
    cents = ev.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    assign, _ = _coarse_assign(ev, cents, n_queries, 1)
    # Persisted: ann_ivf_pq_residual consumes this relation twice (the
    # residual codebook slice and, via pq_encode_residual, the full code
    # relation) — without the persist the corpus-sized coarse argmax runs
    # per consumer. CacheManager dedupes by canonicalized plan, so the two
    # construction sites share one entry.
    return (
        assign.join(F.broadcast(cents.select("cent_id", "cv")), "cent_id")
        .select(
            "vec_id",
            F.col("cent_id").alias("cell"),
            F.zip_with("v", "cv", lambda x, y: x - y).alias("r"),
        )
        .persist()
    )


def pq_encode_residual(
    embeddings: DataFrame,
    m: int = PQ_M,
    k: int = PQ_RESIDUAL_CODES,
    n_centroids: int = N_CENTROIDS,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6

    resid = _residual_relation(embeddings, n_centroids, n_queries)
    d_sub = (F.size("r") / m).cast("int")
    subs = resid.select(
        "vec_id",
        "cell",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice("r", s * d_sub + 1, d_sub),
            )
        ).alias("sub_idx", "sv"),
    )
    cb_lo = n_queries + n_centroids
    cb = subs.filter(
        (F.col("vec_id") >= cb_lo) & (F.col("vec_id") < cb_lo + k)
    ).select(
        (F.col("vec_id") - cb_lo).cast("int").alias("code_idx"),
        "sub_idx",
        F.col("sv").alias("cbv"),
    )
    dist2 = F.aggregate(
        F.zip_with("sv", "cbv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = subs.join(F.broadcast(cb), "sub_idx").select(
        "vec_id", "cell", "sub_idx", "code_idx", q6(dist2).alias("qd")
    )
    best = (
        scored.groupBy("vec_id", "cell", "sub_idx")
        .agg(F.min(F.struct("qd", "code_idx")).alias("_b"))
        .select("vec_id", "cell", "sub_idx", F.col("_b")["code_idx"].alias("code"))
    )
    code_cols = [
        F.max(F.when(F.col("sub_idx") == s, F.col("code")))
        .cast("long")
        .alias(f"code_{s}")
        for s in range(m)
    ]
    return best.groupBy("vec_id", "cell").agg(*code_cols)


def _residual_sql_ctes(
    m: int, k: int, n_centroids: int, n_queries: int
) -> str:
    """Shared CTE block: e, cents, scored_cent, assign, resid, rsubs, rcb."""
    ccos = _COS_SQL.format(a="e.v", b="c.cv")
    cb_lo = n_queries + n_centroids
    return f"""
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
cents AS (
  SELECT vec_id AS cent_id, v AS cv FROM e
  WHERE vec_id >= {n_queries} AND vec_id < {n_queries + n_centroids}
),
scored_cent AS (
  SELECT e.vec_id, e.v, c.cent_id, c.cv, {ccos} AS ccos,
         row_number() OVER (PARTITION BY e.vec_id ORDER BY {ccos} DESC, c.cent_id) AS rn
  FROM e, cents c
),
resid AS (
  SELECT vec_id, cent_id AS cell,
         list_transform(range(1, len(v) + 1), i -> v[i] - cv[i]) AS r
  FROM scored_cent WHERE rn = 1
),
rsubs AS (
  SELECT vec_id, cell, sub_idx,
         list_slice(r, sub_idx * (len(r) // {m}) + 1,
                       (sub_idx + 1) * (len(r) // {m})) AS sv
  FROM resid, (SELECT unnest(range(0, {m})) AS sub_idx)
),
rcb AS (
  SELECT vec_id - {cb_lo} AS code_idx, sub_idx, sv AS cbv
  FROM rsubs WHERE vec_id >= {cb_lo} AND vec_id < {cb_lo + k}
)"""


def pq_encode_residual_sql(
    m: int = PQ_M,
    k: int = PQ_RESIDUAL_CODES,
    n_centroids: int = N_CENTROIDS,
    n_queries: int = N_QUERIES,
) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    qd = q6_sql(
        "list_sum(list_transform(range(1, len(u.sv) + 1),"
        " i -> (u.sv[i] - c.cbv[i]) * (u.sv[i] - c.cbv[i])))"
    )
    codes = ",\n       ".join(
        f"CAST(MAX(CASE WHEN sub_idx = {s} THEN code_idx END) AS BIGINT) AS code_{s}"
        for s in range(m)
    )
    return f"""
WITH {_residual_sql_ctes(m, k, n_centroids, n_queries)},
scored AS (
  SELECT u.vec_id, u.cell, u.sub_idx, c.code_idx, {qd} AS qd
  FROM rsubs u JOIN rcb c ON u.sub_idx = c.sub_idx
),
best AS (
  SELECT vec_id, cell, sub_idx, code_idx,
         row_number() OVER (PARTITION BY vec_id, sub_idx
                            ORDER BY qd, code_idx) AS rn
  FROM scored
)
SELECT vec_id, cell,
       {codes}
FROM best WHERE rn = 1 GROUP BY vec_id, cell
"""


def ann_ivf_pq_residual(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    n_codes: int = PQ_RESIDUAL_CODES,
) -> DataFrame:
    """IVF-PQ search over RESIDUAL codes: per probed cell the query is
    re-expressed as its residual to that cell's centroid, the ADC table is
    built per (query, cell) against the shared residual codebook, and cell
    members are scored by m integer lookups — exactly
    ‖(q − c) − r̂‖² = ‖q − (c + r̂)‖², the true IVFADC distance. Scale: the
    ADC relation is n_queries·n_probe·m·n_codes rows broadcast once;
    candidate volume is the IVF n_probe/n_centroids fraction; the corpus
    never carries floats into the search join — only its m-byte codes."""
    from flink_streaming_etl_spark.functions import q6, vec_norm

    ev = _as_double(embeddings).withColumn("norm", vec_norm(F.col("v")))
    cents = ev.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + n_centroids)
    ).select(
        F.col("vec_id").alias("cent_id"), F.col("v").alias("cv"), F.col("norm").alias("cnorm")
    )
    _, probe_rows = _coarse_assign(ev, cents, n_queries, n_probe)
    # per (query, probed cell): the query's residual to that cell
    qresid = probe_rows.select(
        F.col("vec_id").alias("query_id"),
        "cent_id",
        F.zip_with("v", "cv", lambda x, y: x - y).alias("rq"),
    )
    d_sub = (F.size("rq") / m).cast("int")
    qsubs = qresid.select(
        "query_id",
        "cent_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: F.slice("rq", s * d_sub + 1, d_sub),
            )
        ).alias("sub_idx", "sv"),
    )
    # shared residual codebook (same pinned relation pq_encode_residual uses)
    resid = _residual_relation(embeddings, n_centroids, n_queries)
    cb_lo = n_queries + n_centroids
    rd_sub = (F.size("r") / m).cast("int")
    cb = (
        resid.filter((F.col("vec_id") >= cb_lo) & (F.col("vec_id") < cb_lo + n_codes))
        .select(
            (F.col("vec_id") - cb_lo).cast("int").alias("code_idx"),
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.lit(m - 1)),
                    lambda s: F.slice("r", s * rd_sub + 1, rd_sub),
                )
            ).alias("sub_idx", "cbv"),
        )
    )
    dist2 = F.aggregate(
        F.zip_with("sv", "cbv", lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    adc = qsubs.join(F.broadcast(cb), "sub_idx").select(
        "query_id", "cent_id", "sub_idx", "code_idx", q6(dist2).alias("d")
    )
    adc_wide = (
        adc.groupBy("query_id", "cent_id")
        .pivot("sub_idx", list(range(m)))
        .agg(F.array_sort(F.collect_list(F.struct("code_idx", "d"))).alias("_t"))
        .select(
            "query_id",
            "cent_id",
            *[
                F.transform(F.col(str(s)), lambda t: t["d"]).alias(f"d{s}")
                for s in range(m)
            ],
        )
    )
    codes = pq_encode_residual(embeddings, m, n_codes, n_centroids, n_queries)
    cand = (
        F.broadcast(qresid.select("query_id", "cent_id"))
        .join(codes.withColumnRenamed("cell", "cent_id"), "cent_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .join(F.broadcast(adc_wide), ["query_id", "cent_id"])
    )
    total = F.element_at(F.col("d0"), F.col("code_0").cast("int") + 1)
    for s in range(1, m):
        total = total + F.element_at(F.col(f"d{s}"), F.col(f"code_{s}").cast("int") + 1)
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), total.alias("adc_dist")
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "adc_dist")
    )


def ann_ivf_pq_residual_sql(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_centroids: int = N_CENTROIDS,
    n_probe: int = N_PROBE,
    m: int = PQ_M,
    n_codes: int = PQ_RESIDUAL_CODES,
) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    qd = q6_sql(
        "list_sum(list_transform(range(1, len(q.sv) + 1),"
        " i -> (q.sv[i] - c.cbv[i]) * (q.sv[i] - c.cbv[i])))"
    )
    code_joins = "\n  ".join(
        f"JOIN adc a{s} ON a{s}.query_id = cand.query_id"
        f" AND a{s}.cent_id = cand.cent_id AND a{s}.sub_idx = {s}"
        f" AND a{s}.code_idx = cand.code_{s}"
        for s in range(m)
    )
    total = " + ".join(f"a{s}.d" for s in range(m))
    code_cols = ", ".join(f"kc.code_{s}" for s in range(m))
    return f"""
WITH {_residual_sql_ctes(m, n_codes, n_centroids, n_queries)},
probes AS (
  SELECT vec_id AS query_id, cent_id,
         list_transform(range(1, len(v) + 1), i -> v[i] - cv[i]) AS rq
  FROM scored_cent WHERE vec_id < {n_queries} AND rn <= {n_probe}
),
qsubs AS (
  SELECT query_id, cent_id, sub_idx,
         list_slice(rq, sub_idx * (len(rq) // {m}) + 1,
                        (sub_idx + 1) * (len(rq) // {m})) AS sv
  FROM probes, (SELECT unnest(range(0, {m})) AS sub_idx)
),
adc AS (
  SELECT q.query_id, q.cent_id, q.sub_idx, c.code_idx, {qd} AS d
  FROM qsubs q JOIN rcb c ON q.sub_idx = c.sub_idx
),
codes AS ({pq_encode_residual_sql(m, n_codes, n_centroids, n_queries)}),
cand AS (
  SELECT p.query_id, p.cent_id, kc.vec_id, {code_cols}
  FROM probes p JOIN codes kc ON kc.cell = p.cent_id AND kc.vec_id <> p.query_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id AS neighbor_id, {total} AS adc_dist
  FROM cand
  {code_joins}
)
SELECT query_id, neighbor_id, adc_dist FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY adc_dist ASC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# Multi-probe LSH (Lv et al., VLDB 2007, public): instead of more hash
# tables, each query also probes the buckets whose codes differ in the bits
# it was CLOSEST to flipping — the recall dial that costs query fan-out
# (n_flip extra buckets per query), not index memory. Perturbation set:
# single-bit flips of the n_flip smallest-|margin| planes (the paper's
# first-order probing sequence). Determinism: the margin order is an exact
# integer key floor(|v_i|·1e6)·100 + i (no float sort, unique per plane),
# and probe codes are pure string surgery on the base code — identical on
# both engines. Scale: the corpus side is untouched (one bucket per
# vector); probes are n_queries·(n_flip+1) rows broadcast into the bucket
# join; candidate volume grows linearly in n_flip.

LSH_N_FLIP = 2


def ann_lsh_multiprobe(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_planes: int = BUCKET_DIMS,
    n_flip: int = LSH_N_FLIP,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    e = (
        _as_double(embeddings)
        .withColumn("bucket", _bucket_expr_spark(n_planes))
        .withColumn("norm", vec_norm(F.col("v")))
    )
    # margin keys: exact ints, unique per plane (i breaks any |v_i| tie)
    keys = F.array_sort(
        F.transform(
            F.sequence(F.lit(1), F.lit(n_planes)),
            lambda i: (
                F.floor(F.abs(F.element_at(F.col("v"), i)) * 1000000.0).cast("long")
                * 100
                + i.cast("long")
            ),
        )
    )
    q = e.filter(F.col("vec_id") < n_queries).withColumn("keys", keys)
    probes = q.select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
        F.explode(
            F.concat(
                F.array(F.col("bucket")),
                F.transform(
                    F.slice("keys", 1, n_flip),
                    lambda key: F.concat(
                        F.substring(
                            F.col("bucket"), F.lit(1), (key % 100).cast("int") - 1
                        ),
                        F.when(
                            F.substring(
                                F.col("bucket"), (key % 100).cast("int"), F.lit(1)
                            )
                            == "0",
                            F.lit("1"),
                        ).otherwise(F.lit("0")),
                        F.substring(
                            F.col("bucket"),
                            (key % 100).cast("int") + 1,
                            F.lit(n_planes) - (key % 100).cast("int"),
                        ),
                    ),
                ),
            )
        ).alias("bucket"),
    )
    cand = F.broadcast(probes).join(e, "bucket").filter(
        F.col("vec_id") != F.col("query_id")
    )
    cos = q6(vec_dot(F.col("qv"), F.col("v")) / (F.col("qnorm") * F.col("norm")))
    scored = cand.select(
        "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine")
    )
    w_top = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ann_lsh_multiprobe_sql(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_planes: int = BUCKET_DIMS,
    n_flip: int = LSH_N_FLIP,
) -> str:
    bucket = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(n_planes)
    )
    cos = _COS_SQL.format(a="q.qv", b="e.v")
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket FROM embeddings
),
qk AS (
  SELECT vec_id, v, bucket,
         list_sort(list_transform(range(1, {n_planes} + 1),
           i -> CAST(floor(abs(v[i]) * 1000000.0) AS BIGINT) * 100 + i)) AS keys
  FROM e WHERE vec_id < {n_queries}
),
probes AS (
  SELECT vec_id AS query_id, v AS qv, p.pbucket AS bucket
  FROM qk,
       LATERAL (
         SELECT UNNEST(list_concat(
           [qk.bucket],
           list_transform(list_slice(qk.keys, 1, {n_flip}),
             key -> substring(qk.bucket, 1, CAST(key % 100 AS INT) - 1)
                    || (CASE WHEN substring(qk.bucket, CAST(key % 100 AS INT), 1) = '0'
                             THEN '1' ELSE '0' END)
                    || substring(qk.bucket, CAST(key % 100 AS INT) + 1,
                                 {n_planes} - CAST(key % 100 AS INT)))
         )) AS pbucket
       ) p
),
scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id, {cos} AS cosine
  FROM probes q JOIN e ON e.bucket = q.bucket AND e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# k-NN graph — every vector's top-k neighbors among its LSH-bucket
# candidates. The standard substrate for SemDeDup-style clustering, label
# propagation, and graph-based diversity sampling; at corpus scale the
# bucket restriction is what keeps it off the n² cliff (candidates per
# vector ≤ bucket population; `planes_for_corpus` is the growth dial, same
# as ann_lsh_bucketed). The ranking window partitions by vec_id over the
# bucket-candidate relation only — bounded rows per partition by
# construction, never corpus².

KNN_K = 3


def knn_graph(
    embeddings: DataFrame, k: int = KNN_K, n_planes: int = BUCKET_DIMS
) -> DataFrame:
    """Per-vector top-k cosine neighbors within the vector's sign-LSH
    bucket. Deterministic: q6 cosine, (cosine DESC, neighbor_id ASC)
    tie-break."""
    from pyspark.sql.window import Window

    from flink_streaming_etl_spark.functions import q6, vec_dot

    e = (
        _as_double(embeddings)
        .withColumn("bucket", _bucket_expr_spark(n_planes))
        .withColumn("norm", vec_norm_col())
    )
    a = e.select(
        F.col("vec_id"), F.col("v").alias("va"), F.col("norm").alias("na"), "bucket"
    )
    b = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("vb"),
        F.col("norm").alias("nb"),
        "bucket",
    )
    cand = (
        a.join(b, ["bucket"])
        .filter(F.col("vec_id") != F.col("neighbor_id"))
        .select(
            "vec_id",
            "neighbor_id",
            q6(vec_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("vec_id", "rank", "neighbor_id", "cosine")
    )


def knn_graph_sql(k: int = KNN_K, n_planes: int = BUCKET_DIMS) -> str:
    # n_planes mirrors the Spark signature (the planes_for_corpus dial) so
    # a dialed invocation keeps a matching oracle, as filtered_ann_sql
    # does for k/n_queries.
    bucket = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)" for i in range(n_planes)
    )
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket
  FROM embeddings
), cand AS (
  SELECT a.vec_id, b.vec_id AS neighbor_id, {cos} AS cosine
  FROM e a JOIN e b ON a.bucket = b.bucket AND a.vec_id <> b.vec_id
)
SELECT vec_id, rank, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Filtered ANN — metadata-predicate vector search (top-k among vectors
# matching the query's label), the "filtered search" every production
# vector store exposes. The predicate IS the candidate generator: an equi
# join on label replaces the all-pairs cross, so candidate volume is the
# label population, not the corpus (for very hot labels, compose with the
# sign-LSH bucket exactly as knn_graph does). Deterministic: q6 cosine,
# (cosine DESC, id ASC) tie-break.


def filtered_ann(
    embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    e = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v"), "label"
    ).withColumn("norm", vec_norm(F.col("v")))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        "label",
    )
    cand = (
        q.join(e, ["label"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "label",
            F.col("vec_id").alias("neighbor_id"),
            q6(vec_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("norm"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "label", "cosine")
    )


def filtered_ann_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    cos = _COS_SQL.format(a="q.v", b="e.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings),
q AS (SELECT vec_id AS query_id, v, label FROM e WHERE vec_id < {n_queries}),
cand AS (
  SELECT q.query_id, q.label, e.vec_id AS neighbor_id, {cos} AS cosine
  FROM q JOIN e ON e.label = q.label AND e.vec_id <> q.query_id
)
SELECT query_id, rank, neighbor_id, label, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
  FROM cand
) WHERE rank <= {k}
"""


def centroids_for_corpus(n_vectors: int, target_cell_size: int = 100) -> int:
    """The SemDeDup/IVF corpus-growth dial, operationalized: the centroid
    count that keeps expected cell occupancy ≈ ``target_cell_size``, so
    within-cell pair generation stays O(n · target) instead of O(n²/C).
    C = ceil(n / target): centroids grow LINEARLY with the corpus (the
    standard IVF sizing rule — √n-to-n/100 centroids in the Jégou et al.
    regime), unlike the LSH plane dial which grows logarithmically.
    Measured (SCALE.md round 6): fixed C=16 at a 10× corpus → 8.0× on
    semdedup_drop; C per this dial restores near-linear behavior."""
    import math

    if n_vectors <= target_cell_size:
        return 1
    return max(1, math.ceil(n_vectors / target_cell_size))


# ---------------------------------------------------------------------------
# Int8-quantized (SQ8) search — brute-force top-k over scalar-quantized
# vectors, scored on midpoint-RECONSTRUCTED values (x̂ = mn + (code+0.5)·span,
# the standard SQ8 decode): a 4×-smaller vector store whose scan ranks by
# approximate cosine without keeping any float32 corpus. The per-dim
# min/max model is collected once (|dims| rows) and embedded as array
# literals, so encode+decode is a ZERO-shuffle projection; the scoring
# join is the bounded n_queries·n shape (same as cosine_topk); cosine uses
# the same sequential fold as every vector op, q6-floored — engine-exact.


def ann_int8_topk(
    embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    e = _as_double(embeddings)
    stats = (
        e.select(F.posexplode("v").alias("j", "x"))
        .groupBy("j")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .collect()
    )
    mn = [r["mn"] for r in sorted(stats, key=lambda r: r["j"])]
    mx = [r["mx"] for r in sorted(stats, key=lambda r: r["j"])]
    mn_arr = F.array(*[F.lit(float(v)) for v in mn])
    span_arr = F.array(
        *[F.lit((b - a) / 255.0 if b > a else 1.0) for a, b in zip(mn, mx)]
    )
    # midpoint term carried separately: for a CONSTANT dimension (mx==mn)
    # the half-step must be 0 so decode yields mn exactly — the span=1.0
    # fallback exists only to keep the division defined, and a +0.5
    # offset unrelated to the data scale would distort every cosine.
    half_arr = F.array(
        *[F.lit((b - a) / 510.0 if b > a else 0.0) for a, b in zip(mn, mx)]
    )
    idx = F.sequence(F.lit(1), F.lit(len(mn)))
    xhat = F.transform(
        idx,
        lambda j: F.element_at(mn_arr, j)
        + F.least(
            F.lit(255.0),
            F.floor(
                (F.element_at(F.col("v"), j) - F.element_at(mn_arr, j))
                / F.element_at(span_arr, j)
            ),
        )
        * F.element_at(span_arr, j)
        + F.element_at(half_arr, j),
    )
    decoded = e.select("vec_id", xhat.alias("xv")).withColumn(
        "norm", vec_norm(F.col("xv"))
    )
    q = decoded.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("xv").alias("qv"),
        F.col("norm").alias("qn"),
    )
    cos = q6(vec_dot(F.col("qv"), F.col("xv")) / (F.col("qn") * F.col("norm")))
    scored = (
        F.broadcast(q)
        .join(decoded, F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id", F.col("vec_id").alias("neighbor_id"), cos.alias("cosine_sq8")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sq8"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "cosine_sq8")
    )


def ann_int8_topk_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    cos = _COS_SQL.format(a="q.xv", b="e.xv")
    return f"""
WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
dims AS (
  SELECT vec_id, generate_subscripts(v, 1) AS j, unnest(v) AS x FROM ev
), stats AS (
  SELECT j, MIN(x) AS mn, MAX(x) AS mx FROM dims GROUP BY j
), model AS (
  SELECT list(mn ORDER BY j) AS mn_l,
         list(CASE WHEN mx > mn THEN (mx - mn) / 255.0 ELSE 1.0 END ORDER BY j) AS span_l,
         list(CASE WHEN mx > mn THEN (mx - mn) / 510.0 ELSE 0.0 END ORDER BY j) AS half_l
  FROM stats
), decoded AS (
  SELECT vec_id,
         list_transform(
           range(1, len(v) + 1),
           j -> m.mn_l[j]
                + LEAST(255.0, floor((v[j] - m.mn_l[j]) / m.span_l[j])) * m.span_l[j]
                + m.half_l[j]
         ) AS xv
  FROM ev, model m
), scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id, {cos} AS cosine_sq8
  FROM decoded q JOIN decoded e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, rank, neighbor_id, cosine_sq8 FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY cosine_sq8 DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Hybrid retrieval with reciprocal-rank fusion (RRF, Cormack et al. 2009)
# — the production vector-store pattern: a sparse (term/idf) ranking and a
# dense (cosine) ranking fused as Σ 1/(K + rank). Determinism: the term
# score is EXACT integer arithmetic (idf scaled to 1e6 via integer
# division — no float fold across terms), ranks come from
# (score DESC, id ASC) windows, and the fused score is a fixed two-term
# expression (no aggregation ordering), q6-floored. Scale: query terms
# are pruned to the top-idf few (the WAND-style trick), so the term join
# fans out ≤ n_queries · QUERY_TERMS · df(term); the dense side is the
# bounded cosine_topk; both rank windows partition by query only.

RRF_K = 60
HYBRID_CAND_K = 20
HYBRID_TOP_K = 10
HYBRID_QUERY_TERMS = 8


def hybrid_rrf_search(
    documents: DataFrame,
    embeddings: DataFrame,
    k: int = HYBRID_TOP_K,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_streaming_etl_spark.functions import q6
    from flink_streaming_etl_spark.operators.text import _lm_tokens, lm_tf_relation

    tf = lm_tf_relation(_lm_tokens(documents))
    dfr = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = documents.count()
    # BM25-ratio idf scaled to integer millionths via INTEGER division —
    # identical on both engines, and the per-candidate score Σ tf·idf_e6
    # folds in exact int64 (order-free). At web scale swap long → decimal.
    terms = dfr.select(
        "term",
        F.expr(f"(1000000 * (2 * {n_docs} - 2 * df + 1)) div (2 * df + 1)").alias(
            "idf_e6"
        ),
    )
    wq = Window.partitionBy("doc_id").orderBy(F.desc("idf_e6"), F.asc("term"))
    qterms = (
        tf.filter(F.col("doc_id") < n_queries)
        .join(terms, "term")
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= HYBRID_QUERY_TERMS)
        .select(F.col("doc_id").alias("query_id"), "term", "idf_e6")
    )
    cand = (
        qterms.join(tf, "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.sum(F.col("tf") * F.col("idf_e6")).alias("tscore"))
    )
    wt = Window.partitionBy("query_id").orderBy(F.desc("tscore"), F.asc("doc_id"))
    term_rank = (
        cand.withColumn("trank", F.row_number().over(wt))
        .filter(F.col("trank") <= HYBRID_CAND_K)
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "trank")
    )
    wv = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    vec_rank = (
        cosine_topk(embeddings, k=HYBRID_CAND_K, n_queries=n_queries)
        .withColumn("vrank", F.row_number().over(wv))
        .select("query_id", "neighbor_id", "vrank")
    )
    fused = term_rank.join(vec_rank, ["query_id", "neighbor_id"], "full_outer")
    rrf = q6(
        F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("trank")), F.lit(0.0))
        + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("vrank")), F.lit(0.0))
    )
    wf = Window.partitionBy("query_id").orderBy(F.desc("_rrf"), F.asc("neighbor_id"))
    return (
        fused.withColumn("_rrf", rrf)
        .withColumn("rank", F.row_number().over(wf))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "rank",
            "neighbor_id",
            F.col("_rrf").alias("rrf_score"),
            F.coalesce("trank", F.lit(0)).cast("int").alias("term_rank"),
            F.coalesce("vrank", F.lit(0)).cast("int").alias("vector_rank"),
        )
    )


def hybrid_rrf_search_sql(
    k: int = HYBRID_TOP_K, n_queries: int = N_QUERIES
) -> str:
    return f"""
WITH tf AS (
  SELECT doc_id, t.term, COUNT(*) AS tf
  FROM documents,
       LATERAL (SELECT UNNEST(string_split_regex(lower(text), '[^a-z]+')) AS term) t
  WHERE t.term <> '' GROUP BY doc_id, t.term
), nd AS (SELECT COUNT(*) AS n FROM documents),
terms AS (
  SELECT term, (1000000 * (2 * nd.n - 2 * df + 1)) // (2 * df + 1) AS idf_e6
  FROM (SELECT term, COUNT(*) AS df FROM tf GROUP BY term), nd
), qterms AS (
  SELECT query_id, term, idf_e6 FROM (
    SELECT tf.doc_id AS query_id, tf.term, terms.idf_e6,
           row_number() OVER (PARTITION BY tf.doc_id
                              ORDER BY terms.idf_e6 DESC, tf.term) AS rn
    FROM tf JOIN terms USING (term)
    WHERE tf.doc_id < {n_queries}
  ) WHERE rn <= {HYBRID_QUERY_TERMS}
), cand AS (
  SELECT q.query_id, tf.doc_id, SUM(tf.tf * q.idf_e6) AS tscore
  FROM qterms q JOIN tf USING (term)
  WHERE tf.doc_id <> q.query_id
  GROUP BY q.query_id, tf.doc_id
), term_rank AS (
  SELECT query_id, doc_id AS neighbor_id, trank FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id
                                 ORDER BY tscore DESC, doc_id) AS trank
    FROM cand
  ) WHERE trank <= {HYBRID_CAND_K}
), vtop AS ({cosine_topk_sql(HYBRID_CAND_K, n_queries)}),
vec_rank AS (
  SELECT query_id, neighbor_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cosine DESC, neighbor_id) AS vrank
  FROM vtop
), fused AS (
  SELECT COALESCE(t.query_id, v.query_id) AS query_id,
         COALESCE(t.neighbor_id, v.neighbor_id) AS neighbor_id,
         t.trank, v.vrank,
         floor((COALESCE(1.0 / ({RRF_K} + t.trank), 0.0)
                + COALESCE(1.0 / ({RRF_K} + v.vrank), 0.0)) * 1000000.0)
           / 1000000.0 AS rrf
  FROM term_rank t FULL OUTER JOIN vec_rank v
    ON t.query_id = v.query_id AND t.neighbor_id = v.neighbor_id
)
SELECT query_id, rank, neighbor_id, rrf AS rrf_score,
       CAST(COALESCE(trank, 0) AS INT) AS term_rank,
       CAST(COALESCE(vrank, 0) AS INT) AS vector_rank
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf DESC, neighbor_id) AS rank
  FROM fused
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Binary-code (sign) hamming search — the 64x-compressed ANN tier every
# production vector store keeps as its cheapest filter: each vector's
# sign pattern packs into two 32-bit halves of an int64 pair (16 bytes a
# vector), distance = popcount(xor). All-integer arithmetic: packing is
# a ZERO-shuffle per-row fold, distances are engine-exact, ranking is
# the bounded (n_queries × n) broadcast join — at corpus scale compose
# with the LSH bucket exactly as knn_graph does.


def _sign_code(v, lo: int, hi: int):
    """MSB-first fold of sign bits [lo, hi] into a non-negative long."""
    return F.aggregate(
        F.sequence(F.lit(lo), F.lit(hi)),
        F.lit(0).cast("long"),
        lambda acc, j: acc * 2
        + F.when(F.element_at(v, j) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
    )


def ann_hamming_topk(
    embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES
) -> DataFrame:
    from pyspark.sql.window import Window

    e = _as_double(embeddings)
    d = 64  # embeddings table dimension; two 32-bit halves
    coded = e.select(
        "vec_id",
        _sign_code(F.col("v"), 1, d // 2).alias("c_lo"),
        _sign_code(F.col("v"), d // 2 + 1, d).alias("c_hi"),
    )
    q = coded.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("c_lo").alias("q_lo"),
        F.col("c_hi").alias("q_hi"),
    )
    ham = (
        F.bit_count(F.col("q_lo").bitwiseXOR(F.col("c_lo")))
        + F.bit_count(F.col("q_hi").bitwiseXOR(F.col("c_hi")))
    ).cast("int")
    scored = (
        F.broadcast(q)
        .join(coded, F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), ham.alias("hamming"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "hamming")
    )


def ann_hamming_topk_sql(k: int = TOP_K, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH ev AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
bits AS (
  SELECT vec_id, generate_subscripts(v, 1) AS j, unnest(v) AS x FROM ev
), coded AS (
  SELECT vec_id,
         SUM(CASE WHEN j <= 32 AND x >= 0 THEN (1::BIGINT << (32 - j)) ELSE 0 END) AS c_lo,
         SUM(CASE WHEN j > 32 AND x >= 0 THEN (1::BIGINT << (64 - j)) ELSE 0 END) AS c_hi
  FROM bits GROUP BY vec_id
), scored AS (
  SELECT q.vec_id AS query_id, e.vec_id AS neighbor_id,
         CAST(bit_count(xor(q.c_lo, e.c_lo)) + bit_count(xor(q.c_hi, e.c_hi)) AS INT) AS hamming
  FROM coded q JOIN coded e ON e.vec_id <> q.vec_id
  WHERE q.vec_id < {n_queries}
)
SELECT query_id, rank, neighbor_id, hamming FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY hamming, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Exact embedding covariance — the d x d covariance matrix of the
# embedding corpus as an upper-triangle relation. The 100-TB shape:
# embeddings are quantized to exact 1e-4-unit integers JVM-side (the
# same round-half-away rule both engines implement), then each Arrow
# batch folds into a d x d partial Gram matrix in one numpy matmul and
# emits d(d+1)/2 + d + 1 integer partial rows — the shuffle carries
# O(d^2) rows per PARTITION, never O(n·d^2), and the final assembly is
# arithmetic over exact integer sums (engine-identical doubles by
# construction). Feeds PCA, whitening, and SemDeDup-style diagnostics.

COV_QUANT = 10_000.0  # 1e-4 embedding units; |x| < 3 => |xq| < 30k, products fit int64


def _gram_totals(embeddings: DataFrame) -> DataFrame:
    """Memo-persisted exact-integer Gram totals of the quantized corpus:
    rows (i, j>=i) = Σ xq_i·xq_j, rows (i, -1) = Σ xq_i (the per-dim
    SUMS — the mean vector's numerator), row (-1, -1) = n. Shared by
    :func:`embedding_covariance` and :func:`embedding_whitening_check`
    so neither pays a second corpus pass for moments the fold already
    computed."""
    q = embeddings.select(
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * F.lit(COV_QUANT)).cast("long"),
        ).alias("xq")
    )

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["xq"].to_numpy()).astype(np.int64)
            g = x.T @ x  # exact: |xq| < 2**15, n_rows bounded per batch
            s = x.sum(axis=0)
            iu, ju = np.triu_indices(x.shape[1])
            yield pd.DataFrame(
                {
                    "i": np.concatenate([iu, np.arange(x.shape[1]), [-1]]),
                    "j": np.concatenate(
                        [ju, np.full(x.shape[1], -1), [-1]]
                    ),
                    "v": np.concatenate([g[iu, ju], s, [len(x)]]),
                }
            )

    part = q.mapInPandas(gram, schema="i int, j int, v long")
    # memo-persist the d²-bounded Gram totals: the n-row first() below is
    # one action and the returned covariance DataFrame's eventual action
    # (plus pca_top_component's collect) would otherwise each re-run the
    # corpus-sized mapInPandas fold (ADVICE r7).
    return memo_persist(
        "embedding_cov", part.groupBy("i", "j").agg(F.sum("v").alias("v"))
    )


def embedding_covariance(embeddings: DataFrame) -> DataFrame:
    tot = _gram_totals(embeddings)
    n_row = tot.filter((F.col("i") == -1) & (F.col("j") == -1)).first()
    spark = embeddings.sparkSession
    if n_row is None or n_row["v"] < 2:  # empty / single-vector corpus
        return spark.createDataFrame([], "dim_i int, dim_j int, cov double")
    n = n_row["v"]
    g = tot.filter(F.col("j") >= 0)
    s = tot.filter((F.col("i") >= 0) & (F.col("j") == -1)).select(
        "i", F.col("v").alias("s")
    )
    si = F.broadcast(s.select(F.col("i").alias("_i"), F.col("s").alias("s_i")))
    sj = F.broadcast(s.select(F.col("i").alias("_j"), F.col("s").alias("s_j")))
    # exact ints in, one fixed double expression out: engine-identical.
    cov = (
        (
            F.col("v").cast("double")
            - F.col("s_i").cast("double")
            * F.col("s_j").cast("double")
            / F.lit(float(n))
        )
        / F.lit(float(n - 1))
        / F.lit(COV_QUANT * COV_QUANT)
    )
    return (
        g.join(si, F.col("i") == F.col("_i"))
        .join(sj, F.col("j") == F.col("_j"))
        .select(
            F.col("i").alias("dim_i"),
            F.col("j").alias("dim_j"),
            F.bround(cov, 10).alias("cov"),
        )
    )


def embedding_covariance_sql() -> str:
    q = int(COV_QUANT)
    return f"""
WITH xq AS (
  SELECT vec_id, i - 1 AS i,
         CAST(round(CAST(embedding[i] AS DOUBLE) * {q}) AS BIGINT) AS x
  FROM embeddings, LATERAL (
    SELECT UNNEST(range(1, len(embedding) + 1)) AS i
  ) r
), nn AS (SELECT COUNT(DISTINCT vec_id) AS n FROM xq),
g AS (
  SELECT a.i AS i, b.i AS j, SUM(a.x * b.x) AS v
  FROM xq a JOIN xq b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
),
s AS (SELECT i, SUM(x) AS s FROM xq GROUP BY i)
SELECT g.i AS dim_i, g.j AS dim_j,
       round_even((g.v::DOUBLE - si.s::DOUBLE * sj.s::DOUBLE / nn.n)
                  / (nn.n - 1) / {q}.0 / {q}.0, 10) AS cov
FROM g JOIN s si ON g.i = si.i JOIN s sj ON g.j = sj.i, nn
"""


# ---------------------------------------------------------------------------
# PCA top component — power iteration on the COLLECTED covariance
# matrix. The collect is d^2-bounded (the covariance relation's size is
# independent of the corpus: 2,080 rows at d=64 whether n is 5e2 or
# 1e10), so the driver-side O(d^2) iteration is the correct distributed
# design: all corpus-sized work happened inside embedding_covariance's
# partial Gram folds. Deterministic: fixed uniform start vector, fixed
# iteration count, sign fixed by the largest-|loading| dimension.
# No SQL oracle (iterative); verified against numpy.linalg.eigh in
# tests/test_round7.py.

PCA_ITERS = 500  # (λ2/λ1)^iters: at a narrow 0.95 gap, 500 iters → 7e-12 residual


def pca_top_component(embeddings: DataFrame, iters: int = PCA_ITERS) -> DataFrame:
    cov_rows = embedding_covariance(embeddings).collect()  # d^2-bounded
    spark = embeddings.sparkSession
    if not cov_rows:
        return spark.createDataFrame(
            [], "dim int, loading double, eigenvalue double, explained_ratio double"
        )
    d = max(r["dim_j"] for r in cov_rows) + 1
    c = np.zeros((d, d))
    for r in cov_rows:
        c[r["dim_i"], r["dim_j"]] = r["cov"]
        c[r["dim_j"], r["dim_i"]] = r["cov"]
    v = np.full(d, 1.0 / math.sqrt(d))
    for _ in range(iters):
        w = c @ v
        nrm = float(np.linalg.norm(w))
        if nrm == 0.0:
            break
        v = w / nrm
    if v[int(np.argmax(np.abs(v)))] < 0:
        v = -v
    eigval = float(v @ c @ v)
    total_var = float(np.trace(c))
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [
            (
                int(i),
                float(round(v[i], 8)),
                float(round(eigval, 10)),
                float(round(eigval / total_var, 8)) if total_var else 0.0,
            )
            for i in range(d)
        ],
        "dim int, loading double, eigenvalue double, explained_ratio double",
    )


# ---------------------------------------------------------------------------
# Embedding norm report — the vector-store health check: exact integer
# squared-norm percentiles per label (norm^2 = sum of quantized-int
# squares — order-insensitive exact integers, so nearest-rank
# percentiles compare engine-exactly) plus the derived norm at the
# median (one sqrt on an exact integer: deterministic). Catches
# un-normalized batches, dead (near-zero) vectors, and per-label norm
# drift before they poison cosine retrieval. Zero-shuffle per-row fold
# into one label-keyed window + aggregation.


def embedding_norm_report(embeddings: DataFrame) -> DataFrame:
    normsq = F.aggregate(
        F.transform(
            "embedding",
            lambda v: F.round(v.cast("double") * F.lit(COV_QUANT)).cast("long"),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x * x,
    )
    base = embeddings.select("vec_id", "label", normsq.alias("nsq"))
    wr = Window.partitionBy("label").orderBy("nsq", "vec_id")
    wn = Window.partitionBy("label")
    ranked = base.select(
        "label",
        "nsq",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    def at(q: float) -> F.Column:
        return F.min(
            F.when(F.col("rn") == F.ceil(F.lit(q) * F.col("n")), F.col("nsq"))
        )

    agg = ranked.groupBy("label").agg(
        F.max("n").cast("long").alias("n_vectors"),
        at(0.50).alias("p50_normsq"),
        at(0.95).alias("p95_normsq"),
        F.min("nsq").alias("min_normsq"),
        F.max("nsq").alias("max_normsq"),
    )
    return agg.select(
        "label",
        "n_vectors",
        "p50_normsq",
        "p95_normsq",
        "min_normsq",
        "max_normsq",
        F.bround(
            F.sqrt(F.col("p50_normsq").cast("double")) / F.lit(COV_QUANT), 6
        ).alias("p50_norm"),
    )


def embedding_norm_report_sql() -> str:
    q = int(COV_QUANT)
    return f"""
WITH nsq AS (
  SELECT vec_id, label,
         CAST((SELECT SUM(CAST(round(CAST(x AS DOUBLE) * {q}) AS BIGINT)
                          * CAST(round(CAST(x AS DOUBLE) * {q}) AS BIGINT))
               FROM UNNEST(embedding) AS u(x)) AS BIGINT) AS nsq
  FROM embeddings
), ranked AS (
  SELECT label, nsq,
         row_number() OVER (PARTITION BY label ORDER BY nsq, vec_id) AS rn,
         COUNT(*) OVER (PARTITION BY label) AS n
  FROM nsq
), agg AS (
  SELECT label,
         CAST(MAX(n) AS BIGINT) AS n_vectors,
         MIN(CASE WHEN rn = CEIL(0.50::DOUBLE * n) THEN nsq END) AS p50_normsq,
         MIN(CASE WHEN rn = CEIL(0.95::DOUBLE * n) THEN nsq END) AS p95_normsq,
         MIN(nsq) AS min_normsq,
         MAX(nsq) AS max_normsq
  FROM ranked GROUP BY label
)
SELECT label, n_vectors, p50_normsq, p95_normsq, min_normsq, max_normsq,
       round_even(sqrt(p50_normsq::DOUBLE) / {q}, 6) AS p50_norm
FROM agg
"""


# ---------------------------------------------------------------------------
# kNN label-prediction eval — the embedding-quality metric that closes
# the ANN loop: predict each vector's label by majority vote over its
# knn_graph neighbors (deterministic tie-break: larger vote count, then
# smaller label), report per-label accuracy. Rides the bucket-bounded
# knn graph (no new pair computation); the vote is one (vec_id,
# label)-keyed aggregation and one max_by argmax — the same
# partial-aggregating shape as the IVF coarse assign.


def knn_label_eval(
    embeddings: DataFrame, k: int = KNN_K, n_planes: int = BUCKET_DIMS
) -> DataFrame:
    graph = knn_graph(embeddings, k=k, n_planes=n_planes)
    labels = embeddings.select("vec_id", "label")
    nb = graph.join(
        F.broadcast(labels.select(F.col("vec_id").alias("neighbor_id"),
                                  F.col("label").alias("nb_label"))),
        "neighbor_id",
    )
    votes = nb.groupBy("vec_id", "nb_label").agg(
        F.count(F.lit(1)).alias("votes")
    )
    # argmax key encoded arithmetically (votes dominant, smaller label
    # wins ties): labels are < 1000 by contract, so votes·1000 − label
    # orders exactly like (votes, −label) — and the same scalar key works
    # in every engine (DuckDB's arg_max has no struct-key overload).
    pred = votes.groupBy("vec_id").agg(
        F.max_by(
            "nb_label", F.col("votes") * 1000 - F.col("nb_label")
        ).alias("pred_label")
    )
    joined = pred.join(labels, "vec_id")
    return (
        joined.groupBy("label")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum((F.col("pred_label") == F.col("label")).cast("int"))
            .cast("long")
            .alias("correct"),
        )
        .select(
            "label",
            "n",
            "correct",
            F.bround(F.col("correct") / F.col("n"), 4).alias("accuracy"),
        )
    )


def knn_label_eval_sql(k: int = KNN_K, n_planes: int = BUCKET_DIMS) -> str:
    return f"""
WITH graph AS ({knn_graph_sql(k, n_planes)}),
labels AS (SELECT vec_id, label FROM embeddings),
nb AS (
  SELECT g.vec_id, l.label AS nb_label
  FROM graph g JOIN labels l ON g.neighbor_id = l.vec_id
),
votes AS (
  SELECT vec_id, nb_label, COUNT(*) AS votes FROM nb GROUP BY vec_id, nb_label
),
pred AS (
  SELECT vec_id, arg_max(nb_label, votes * 1000 - nb_label) AS pred_label
  FROM votes GROUP BY vec_id
),
joined AS (SELECT p.vec_id, p.pred_label, l.label
           FROM pred p JOIN labels l ON p.vec_id = l.vec_id)
SELECT label,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN pred_label = label THEN 1 ELSE 0 END) AS BIGINT)
         AS correct,
       round_even(SUM(CASE WHEN pred_label = label THEN 1 ELSE 0 END)::DOUBLE
                  / COUNT(*), 4) AS accuracy
FROM joined GROUP BY label
"""


# ---------------------------------------------------------------------------
# ZCA whitening check — closes the covariance -> PCA -> WHITENING loop:
# W = U diag(1/sqrt(max(lambda, floor))) U^T from the eigendecomposition
# of the d x d covariance (driver-side on the d^2-bounded collected
# matrix — the same distributed split as pca_top_component: all
# corpus-sized work stays in the partial Gram folds), then one Arrow
# pass whitens each batch (x - mu) @ W^T and folds the WHITENED
# covariance partials — whose assembly must be the identity matrix.
# That identity test IS the operator's output: the vector-store health
# check run before cosine retrieval over whitened embeddings.
# No SQL oracle (iterative eigh); numpy-verified in tests/test_round8.py.

WHITEN_EIG_FLOOR = 1e-9


def embedding_whitening_check(embeddings: DataFrame) -> DataFrame:
    cov_rows = embedding_covariance(embeddings).collect()  # d^2-bounded
    spark = embeddings.sparkSession
    if not cov_rows:
        return spark.createDataFrame([], "dim_i int, dim_j int, cov double")
    d = max(r["dim_j"] for r in cov_rows) + 1
    c = np.zeros((d, d))
    for r in cov_rows:
        c[r["dim_i"], r["dim_j"]] = r["cov"]
        c[r["dim_j"], r["dim_i"]] = r["cov"]
    lam, u = np.linalg.eigh(c)
    w = (u * (1.0 / np.sqrt(np.maximum(lam, WHITEN_EIG_FLOOR)))) @ u.T
    # mean vector from the SAME memoized Gram totals the covariance came
    # from (rows (i, -1) are the per-dim quantized sums, (-1, -1) is n) —
    # no extra corpus pass (code-review r8); the 1e-4 quantization in mu
    # matches C's own quantization and sits far inside the identity gate.
    mu_rows = (
        _gram_totals(embeddings)
        .filter((F.col("i") >= 0) & (F.col("j") == -1))
        .collect()  # d-bounded
    )
    n_tot = _gram_totals(embeddings).filter(
        (F.col("i") == -1) & (F.col("j") == -1)
    ).first()
    n = int(n_tot["v"]) if n_tot else 0
    if n < 2:
        return spark.createDataFrame([], "dim_i int, dim_j int, cov double")
    mu = np.zeros(d)
    for r in mu_rows:
        mu[r["i"]] = r["v"] / n / COV_QUANT

    bmu, bw = mu, w

    def gram(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.vstack(pdf["e"].to_numpy()).astype(np.float64)
            z = (x - bmu) @ bw.T
            g = z.T @ z
            iu, ju = np.triu_indices(z.shape[1])
            yield pd.DataFrame(
                {"i": iu, "j": ju, "v": g[iu, ju], "n": len(z)}
            )

    part = embeddings.select(
        F.transform("embedding", lambda v: v.cast("double")).alias("e")
    ).mapInPandas(gram, schema="i int, j int, v double, n long")
    tot = part.groupBy("i", "j").agg(
        F.sum("v").alias("v"), F.sum("n").alias("nn")
    )
    return tot.select(
        F.col("i").alias("dim_i"),
        F.col("j").alias("dim_j"),
        # each partition emits each (i,j) once with its row count, so the
        # summed nn equals the total vector count n; cov = v / (n - 1)
        F.bround(F.col("v") / (F.col("nn") - 1), 6).alias("cov"),
    )


def whitening_identity_report(embeddings: DataFrame) -> DataFrame:
    """One-row scalar reduction of :func:`embedding_whitening_check` —
    the driver-hashable twin that earns the whitening pipeline an exact
    cross-engine value check (r9 verdict #8).

    The full check relation (d(d+1)/2 whitened-covariance entries) is not
    SQL-expressible (the whitener comes from a driver-side eigh), but the
    PROPERTY it verifies is: W = C^{-1/2} guarantees W·C·W^T = I for any
    full-rank corpus, up to the numerical noise of the 1e-6 covariance
    quantization feeding the eigh (measured ~5e-5 at gate scale). So the
    report quantizes the two deviation maxima at 1e-3 — 20x above the
    noise floor, orders of magnitude below any real whitening failure —
    where the mathematically-guaranteed value is exactly 0.0, and pairs
    them with the data-derived relation size the oracle computes
    independently from the embeddings table. A broken whitener (wrong
    eigh orientation, mean not subtracted, covariance scaled) moves the
    deviations by O(1) and fails the hash; the pytest suite keeps the
    element-level assertions."""
    wc = embedding_whitening_check(embeddings)
    dev = F.when(
        F.col("dim_i") == F.col("dim_j"), F.abs(F.col("cov") - 1.0)
    ).otherwise(F.abs(F.col("cov")))
    off = F.when(F.col("dim_i") != F.col("dim_j"), F.abs(F.col("cov")))
    return wc.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        (F.max(F.col("dim_j")) + 1).cast("long").alias("d"),
        (F.bround(F.max(off), 3) + F.lit(0.0)).alias("max_abs_offdiag_q3"),
        (F.bround(
            F.max(F.when(F.col("dim_i") == F.col("dim_j"),
                         F.abs(F.col("cov") - 1.0))), 3
        ) + F.lit(0.0)).alias("max_diag_dev_q3"),
        (F.bround(F.max(dev), 3) == 0.0).alias("identity_ok"),
    ).filter(F.col("n_pairs") > 0)


def whitening_identity_report_sql() -> str:
    # The oracle derives d and the pair count from the embeddings table
    # itself and pins the deviation maxima at the value the algebra
    # guarantees (see whitening_identity_report docstring); an empty or
    # degenerate (<2 rows) corpus yields the empty relation on the Spark
    # side, mirrored by the WHERE gate here.
    return """
WITH dims AS (
  SELECT MAX(len(embedding)) AS d, COUNT(*) AS n FROM embeddings
)
SELECT CAST(d * (d + 1) / 2 AS BIGINT) AS n_pairs,
       CAST(d AS BIGINT) AS d,
       0.0 AS max_abs_offdiag_q3,
       0.0 AS max_diag_dev_q3,
       TRUE AS identity_ok
FROM dims WHERE n >= 2
"""


# ---------------------------------------------------------------------------
# PQ shortlist + exact rerank (round 9): the standard production two-stage
# vector search (Jégou et al. 2011 §V-E — every deployed IVF-PQ index
# reranks its ADC shortlist against full-precision vectors). Stage 1 is
# the existing compressed-domain IVF-ADC scan producing a cheap
# ``shortlist``-sized candidate list per query; stage 2 rescores ONLY
# those rows with the exact q6 cosine and re-ranks to the final top-k.
# Scale shape: the full-precision corpus is touched for shortlist·|Q| rows
# (an id-keyed join with the tiny shortlist BROADCAST so the corpus never
# shuffles), instead of n rows — the memory story of PQ with the accuracy
# story of exact scoring. Deterministic end to end (pinned codebooks, q6
# scores, id tie-breaks), so the two-stage result is oracle-exact.

RERANK_SHORTLIST = 20


def ann_pq_rerank(
    embeddings: DataFrame,
    k: int = TOP_K,
    shortlist: int = RERANK_SHORTLIST,
    n_queries: int = N_QUERIES,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    e = _as_double(embeddings).withColumn("norm", vec_norm(F.col("v")))
    short = ann_ivf_pq(embeddings, k=shortlist, n_queries=n_queries).select(
        "query_id", "neighbor_id"
    )
    nv = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("v").alias("nv"),
        F.col("norm").alias("nnorm"),
    )
    qv = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    cos = q6(vec_dot(F.col("nv"), F.col("qv")) / (F.col("nnorm") * F.col("qnorm")))
    scored = (
        nv.join(F.broadcast(short), "neighbor_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "neighbor_id", "cosine")
    )


def ann_pq_rerank_sql(
    k: int = TOP_K, shortlist: int = RERANK_SHORTLIST, n_queries: int = N_QUERIES
) -> str:
    cos = _COS_SQL.format(a="nv.v", b="qv.v")
    return f"""
WITH short AS ({ann_ivf_pq_sql(k=shortlist, n_queries=n_queries)}),
e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
scored AS (
  SELECT s.query_id, s.neighbor_id, {cos} AS cosine
  FROM short s
  JOIN e nv ON nv.vec_id = s.neighbor_id
  JOIN e qv ON qv.vec_id = s.query_id
)
SELECT query_id, neighbor_id, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rn
  FROM scored
) WHERE rn <= {k}
"""


# ---------------------------------------------------------------------------
# Lloyd UPDATE step against pinned centroids (round 9): the oracle-exact
# twin of the iterative ``kmeans_assign`` loop's OTHER half. The pinned
# assignment kernel already has an exact value check
# (``kmeans_assign_pinned``); this closes the loop by value-checking the
# centroid recomputation: per-(cell, dim) means folded as EXACT integers
# (coordinates quantized to 1e-4 units, summed as bigints — order-free,
# so any partitioning gives the identical rational; one double division +
# q6 at the end). Scale shape: posexplode emits n·d narrow rows but the
# partial aggregation combines map-side, so the shuffle carries at most
# k·d rows per task — the textbook distributed Lloyd update.


def kmeans_update_pinned(
    embeddings: DataFrame, k: int = N_CENTROIDS, n_queries: int = N_QUERIES
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6, vec_dot

    e = _as_double(embeddings).withColumn("norm", vec_norm_col())
    cents = e.filter(
        (F.col("vec_id") >= n_queries) & (F.col("vec_id") < n_queries + k)
    ).select(
        (F.col("vec_id") - n_queries).alias("centroid_idx"),
        F.col("v").alias("cv"),
        F.col("norm").alias("cnorm"),
    )
    cos = q6(vec_dot(F.col("v"), F.col("cv")) / (F.col("norm") * F.col("cnorm")))
    w = Window.partitionBy("vec_id").orderBy(
        F.col("cos").desc(), F.col("centroid_idx")
    )
    assigned = (
        e.join(F.broadcast(cents))
        .withColumn("cos", cos)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("centroid_idx", "v")
    )
    xq = F.floor(F.col("x") * F.lit(COV_QUANT)).cast("long")
    return (
        assigned.select("centroid_idx", F.posexplode("v").alias("j", "x"))
        .select("centroid_idx", F.col("j").cast("long").alias("dim"), xq.alias("xq"))
        .groupBy("centroid_idx", "dim")
        .agg(
            F.sum("xq").alias("sq"),
            F.count(F.lit(1)).cast("long").alias("n_members"),
        )
        .select(
            "centroid_idx",
            "dim",
            "n_members",
            q6(F.col("sq") / (F.col("n_members") * F.lit(COV_QUANT))).alias(
                "mean_coord"
            ),
        )
    )


def kmeans_update_pinned_sql(k: int = N_CENTROIDS, n_queries: int = N_QUERIES) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    cos = _COS_SQL.format(a="e.v", b="c.cv")
    mean = q6_sql(f"SUM(xq) / (COUNT(*) * {COV_QUANT})")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
c AS (SELECT vec_id - {n_queries} AS centroid_idx, v AS cv FROM e
      WHERE vec_id >= {n_queries} AND vec_id < {n_queries + k}),
assign AS (
  SELECT vec_id, v, centroid_idx FROM (
    SELECT e.vec_id, e.v, c.centroid_idx,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos} DESC, c.centroid_idx) AS rn
    FROM e, c
  ) WHERE rn = 1
),
ex AS (
  SELECT centroid_idx, j - 1 AS dim,
         CAST(floor(v[j] * {COV_QUANT}) AS BIGINT) AS xq
  FROM assign, UNNEST(range(1, len(v) + 1)) AS t(j)
)
SELECT centroid_idx, dim,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       {mean} AS mean_coord
FROM ex GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Semantic decontamination check (round 9): the embedding-space sibling of
# dedup.contamination_check. Exact n-gram overlap misses PARAPHRASED
# benchmark leakage; the standard countermeasure scores each held-out
# example's nearest training neighbors in embedding space and flags
# high-cosine hits. Split is a deterministic md5 hash of the vec_id (the
# same no-RNG discipline as train_val_test_split); candidates come from
# the sign-LSH orthant bucket (``planes_for_corpus`` is the growth dial),
# so candidate volume is bucket-bounded, never |eval|·|train|. At real
# scale the eval split is a benchmark suite — thousands of rows — so the
# bucketed eval side broadcasts and the train corpus never shuffles more
# than once. Totality: every eval vector appears, bucket-empty ones with
# zero candidates (max_cosine NULL), so the report doubles as coverage.

SEM_CONTAM_THRESHOLD = 0.4
SEM_CONTAM_EVAL_BUCKETS = 10  # md5(vec_id) % 10 == 0 → eval (~10%)


def semantic_contamination_check(
    embeddings: DataFrame,
    threshold: float = SEM_CONTAM_THRESHOLD,
    n_planes: int = BUCKET_DIMS,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import md5_int, q6, vec_dot, vec_norm

    is_eval = (
        F.pmod(
            md5_int(F.col("vec_id").cast("string"), salt="semsplit"),
            F.lit(SEM_CONTAM_EVAL_BUCKETS),
        )
        == 0
    )
    e = (
        _as_double(embeddings)
        .withColumn("bucket", _bucket_expr_spark(n_planes))
        .withColumn("norm", vec_norm(F.col("v")))
        .withColumn("_eval", is_eval)
    )
    ev = e.filter(F.col("_eval")).select(
        "vec_id", F.col("v").alias("qv"), F.col("norm").alias("qn"), "bucket"
    )
    tr = e.filter(~F.col("_eval")).select(
        F.col("v").alias("tv"), F.col("norm").alias("tn"), "bucket"
    )
    cos = q6(vec_dot(F.col("qv"), F.col("tv")) / (F.col("qn") * F.col("tn")))
    hits = (
        ev.join(tr, "bucket")
        .select("vec_id", cos.alias("cos"))
        .groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.when(F.col("cos") >= threshold, 1).otherwise(0))
            .cast("long")
            .alias("n_hits"),
            F.max("cos").alias("max_cosine"),
        )
    )
    zero = F.coalesce(F.col("n_candidates"), F.lit(0)).cast("long")
    zhits = F.coalesce(F.col("n_hits"), F.lit(0)).cast("long")
    return ev.select("vec_id").join(hits, "vec_id", "left").select(
        "vec_id",
        zero.alias("n_candidates"),
        zhits.alias("n_hits"),
        "max_cosine",
        (zhits > 0).alias("is_contaminated"),
    )


def semantic_contamination_check_sql(
    threshold: float = SEM_CONTAM_THRESHOLD, n_planes: int = BUCKET_DIMS
) -> str:
    from flink_streaming_etl_spark.functions import md5_int_sql

    bucket = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(n_planes)
    )
    split = md5_int_sql("vec_id::VARCHAR", salt="semsplit")
    cos = _COS_SQL.format(a="q.qv", b="t.tv")
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket,
         ({split}) % {SEM_CONTAM_EVAL_BUCKETS} = 0 AS is_eval
  FROM embeddings
),
ev AS (SELECT vec_id, v AS qv, bucket FROM e WHERE is_eval),
tr AS (SELECT v AS tv, bucket FROM e WHERE NOT is_eval),
hits AS (
  SELECT q.vec_id,
         COUNT(*) AS n_candidates,
         SUM(CASE WHEN {cos} >= {threshold} THEN 1 ELSE 0 END) AS n_hits,
         MAX({cos}) AS max_cosine
  FROM ev q JOIN tr t ON q.bucket = t.bucket
  GROUP BY 1
)
SELECT q.vec_id,
       CAST(COALESCE(h.n_candidates, 0) AS BIGINT) AS n_candidates,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       h.max_cosine,
       COALESCE(h.n_hits, 0) > 0 AS is_contaminated
FROM ev q LEFT JOIN hits h ON q.vec_id = h.vec_id
"""


# ---------------------------------------------------------------------------
# Cluster-diversity sampling (round 9): ONE representative per coarse
# embedding cell — the "keep the most central exemplar per cluster"
# selection stage that follows SemDeDup-style clustering in curation
# pipelines (cluster → dedup within cell → sample across cells for
# coverage). Rides the same pinned-centroid assignment kernel as
# kmeans_assign_pinned; the per-cell argmax is a PARTIAL-AGGREGATING
# max(struct) fold (map-side combine, k rows out), never a corpus-wide
# window sort. The preference key is the RAW q6 cosine double (already
# floor-quantized identically on both engines by the assignment kernel)
# with -vec_id as tie-break; the r9 shape re-scaled it through
# (cos*1e6).cast(long), whose truncation toward zero disagreed with the
# SQL twin's rounding CAST for values landing just below the integer
# (249/1e6*1e6 = 248.999...) — ADVICE r9 (high). Doubles are totally
# ordered here, so ranking and emitting the raw value is both exact and
# cheaper.


def diverse_sample_report(
    embeddings: DataFrame, k: int = N_CENTROIDS, n_queries: int = N_QUERIES
) -> DataFrame:
    assigned = kmeans_assign_pinned(embeddings, k, n_queries)
    best = assigned.groupBy("centroid_idx").agg(
        F.max(
            F.struct(F.col("cosine").alias("p"), (-F.col("vec_id")).alias("ni"))
        ).alias("_b"),
        F.count(F.lit(1)).cast("long").alias("cell_size"),
    )
    return best.select(
        "centroid_idx",
        (-F.col("_b.ni")).alias("vec_id"),
        F.col("_b.p").alias("cosine"),
        "cell_size",
    )


def diverse_sample_report_sql(k: int = N_CENTROIDS, n_queries: int = N_QUERIES) -> str:
    return f"""
WITH assigned AS ({kmeans_assign_pinned_sql(k, n_queries)}),
ranked AS (
  SELECT centroid_idx, vec_id, cosine,
         COUNT(*) OVER (PARTITION BY centroid_idx) AS cell_size,
         row_number() OVER (PARTITION BY centroid_idx
                            ORDER BY cosine DESC, vec_id) AS rn
  FROM assigned
)
SELECT centroid_idx, vec_id, cosine,
       CAST(cell_size AS BIGINT) AS cell_size
FROM ranked WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Hard-negative mining (round 10) — the data side of contrastive embedding
# training (Karpukhin et al. 2020, DPR: in-batch + hard negatives;
# public): for each probe query, surface corpus vectors that are CLOSE
# but not near-duplicate — cosine inside [lo, hi) — because those are the
# negatives that actually move a bi-encoder. Scale shape: candidate
# generation is the SAME sign-plane bucket blocking as ann_lsh_bucketed
# (candidates ∝ n/2^p per bucket, growth dial planes_for_corpus), the
# band filter runs inside the bucket-local join, and the final top-k is a
# per-query window over band-filtered candidates only — never a corpus
# sort. Determinism: q6 cosine, neighbor-id tie-break.

NEG_COS_LO = 0.2
NEG_COS_HI = 0.9
NEG_TOP_K = 5


def hard_negative_mining(
    embeddings: DataFrame,
    k: int = NEG_TOP_K,
    lo: float = NEG_COS_LO,
    hi: float = NEG_COS_HI,
    n_queries: int = N_QUERIES,
    n_planes: int = BUCKET_DIMS,
) -> DataFrame:
    from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

    e = _as_double(embeddings).withColumn(
        "bucket", _bucket_expr_spark(n_planes)
    ).withColumn("norm", vec_norm(F.col("v")))
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        "bucket",
    )
    t = e.filter(F.col("vec_id") >= n_queries).select(
        F.col("vec_id").alias("neg_id"),
        F.col("v").alias("tv"),
        F.col("norm").alias("tn"),
        "bucket",
    )
    cos = q6(vec_dot(F.col("qv"), F.col("tv")) / (F.col("qn") * F.col("tn")))
    cand = (
        q.join(t, "bucket")
        .select("query_id", "neg_id", cos.alias("cosine"))
        .filter((F.col("cosine") >= lo) & (F.col("cosine") < hi))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neg_id")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neg_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def hard_negative_mining_sql(
    k: int = NEG_TOP_K,
    lo: float = NEG_COS_LO,
    hi: float = NEG_COS_HI,
    n_queries: int = N_QUERIES,
    n_planes: int = BUCKET_DIMS,
) -> str:
    # n_planes mirrors the Spark signature (ADVICE r10: a hardcoded
    # plane count would silently compare different candidate sets when
    # the pair is called with a non-default dial)
    bucket = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(n_planes)
    )
    cos = _COS_SQL.format(a="q.v", b="t.v")
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, v, bucket FROM e WHERE vec_id < {n_queries}),
t AS (SELECT vec_id AS neg_id, v, bucket FROM e WHERE vec_id >= {n_queries}),
cand AS (
  SELECT q.query_id, t.neg_id, {cos} AS cosine
  FROM q JOIN t ON q.bucket = t.bucket
)
SELECT query_id, neg_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neg_id) AS rank
  FROM cand WHERE cosine >= {lo} AND cosine < {hi}
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# PageRank (pinned) — damped PageRank over the k-NN graph, T power
# iterations UNROLLED into the dataflow, all arithmetic in exact int64
# micro-units so the result is engine-order-independent (the same
# exact-integer-fold discipline as kmeans_update_pinned). This is the
# graph-centrality quality signal web-corpus curation uses (Common
# Crawl ranks hosts by centrality before sampling; a high-PR node in
# the embedding k-NN graph is a "representative" document, a near-zero
# one an outlier).
#
# Scale design: edges = n·k rows (knn_graph is bucket-blocked, never
# all-pairs). Each iteration is ONE shuffle of the contribution
# relation keyed by dst plus a node-keyed left join — the classic
# unrolled power-iteration plan; nothing driver-side, no collect. The
# iteration count is a dial (fixed T unrolls into T join+agg stages;
# production convergence runs pick T ~ 10-20 — linear stage growth,
# same per-stage cost). Integer micro-units: r0 = SCALE per node;
# contribution = pr DIV out_degree (exact truncating int division);
# r' = (SCALE - SCALE*d) + (d_num * Σcontrib) DIV d_den. All values
# nonnegative, so DuckDB's `//` (floor) and Spark's `DIV` (trunc)
# agree; magnitudes stay far inside int64 (Σ mass ≤ n·SCALE).
# Dangling nodes (out-degree 0 — a singleton LSH bucket) simply leak
# their mass, the standard simplification; they still RECEIVE rank.

PR_ITERS = 2
PR_SCALE = 1_000_000
PR_DAMP_NUM, PR_DAMP_DEN = 85, 100  # d = 0.85


def pagerank_pinned(
    embeddings: DataFrame,
    k: int = KNN_K,
    n_planes: int = BUCKET_DIMS,
    iters: int = PR_ITERS,
) -> DataFrame:
    """Exact int64 damped PageRank over the bucket-blocked k-NN graph.

    Returns (vec_id, pagerank_u) where pagerank_u is the rank after
    ``iters`` iterations in micro-units (uniform init = PR_SCALE).
    Deterministic: integer sums are order-independent.
    """
    edges = memo_persist(
        "pagerank_edges",
        knn_graph(embeddings, k, n_planes).select(
            F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
        ),
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    esrc = edges.join(outdeg, "src")
    nodes = embeddings.select("vec_id")
    base = PR_SCALE - PR_SCALE * PR_DAMP_NUM // PR_DAMP_DEN
    ranks = nodes.select(
        "vec_id", F.lit(PR_SCALE).cast("long").alias("pr")
    )
    for _ in range(iters):
        contrib = esrc.join(ranks, esrc["src"] == ranks["vec_id"]).select(
            F.col("dst"), F.expr("pr DIV od").alias("c")
        )
        incoming = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(incoming, nodes["vec_id"] == incoming["dst"], "left")
            .select(
                nodes["vec_id"],
                (
                    F.lit(base)
                    + F.expr(
                        f"({PR_DAMP_NUM} * coalesce(s, cast(0 as bigint)))"
                        f" DIV {PR_DAMP_DEN}"
                    )
                )
                .cast("long")
                .alias("pr"),
            )
        )
    return ranks.select("vec_id", F.col("pr").alias("pagerank_u"))


def pagerank_pinned_sql(
    k: int = KNN_K, n_planes: int = BUCKET_DIMS, iters: int = PR_ITERS
) -> str:
    base = PR_SCALE - PR_SCALE * PR_DAMP_NUM // PR_DAMP_DEN
    ctes = [
        f"WITH knn AS ({knn_graph_sql(k, n_planes)}),",
        "edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM knn),",
        "outdeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),",
        "nodes AS (SELECT vec_id FROM embeddings),",
        f"r0 AS (SELECT vec_id, CAST({PR_SCALE} AS BIGINT) AS pr FROM nodes),",
    ]
    for i in range(iters):
        ctes.append(
            f"c{i + 1} AS (SELECT e.dst, SUM(r.pr // o.od) AS s"
            f" FROM edges e JOIN outdeg o USING (src)"
            f" JOIN r{i} r ON r.vec_id = e.src GROUP BY e.dst),"
        )
        ctes.append(
            f"r{i + 1} AS (SELECT n.vec_id,"
            f" CAST({base} + ({PR_DAMP_NUM} * COALESCE(c.s, 0))"
            f" // {PR_DAMP_DEN} AS BIGINT) AS pr"
            f" FROM nodes n LEFT JOIN c{i + 1} c ON c.dst = n.vec_id),"
        )
    body = "\n".join(ctes).rstrip(",")
    return f"{body}\nSELECT vec_id, pr AS pagerank_u FROM r{iters}\n"


# ---------------------------------------------------------------------------
# PCA power iteration (pinned) — the oracle-backed twin of
# pca_top_component. The iterative family was rows-only ("not
# SQL-expressible"); this entry retires that excuse for PCA the same way
# kmeans_*_pinned did for Lloyd's two halves: BOTH engines run the
# IDENTICAL fixed-order arithmetic, so the result is bit-equal without
# needing convergence. The distributed work is embedding_covariance's
# Gram folds (corpus-sized, memoized, already ★); everything after is
# d²-bounded driver math — the correct split at any corpus size, since
# the covariance relation is 2,080 rows at d=64 whether n is 5e2 or
# 1e10. Determinism argument: the covariance values are engine-equal
# (★embedding_covariance pins them); DuckDB's list_dot_product folds
# left-to-right exactly like the sequential Python dot below (verified
# bit-identical over randomized magnitude-spread trials); sqrt and
# division are correctly-rounded IEEE; the oracle's recursive CTE runs
# the same iteration count with the same guard. No sign convention
# needed — identical arithmetic lands on the identical sign.

PCA_POWER_ITERS = 60


def _seq_dot(a: list, b: list) -> float:
    acc = 0.0
    for x, y in zip(a, b):
        acc += x * y
    return acc


def pca_power_pinned(
    embeddings: DataFrame, iters: int = PCA_POWER_ITERS
) -> DataFrame:
    """Top principal component via ``iters`` pinned power-iteration steps
    on the exact covariance relation. Returns one row per dimension:
    (dim, loading, eigenvalue, explained_ratio), q6-quantized."""
    from flink_streaming_etl_spark.functions import q6

    cov_rows = embedding_covariance(embeddings).collect()  # d²-bounded
    spark = embeddings.sparkSession
    schema = "dim int, loading double, eigenvalue double, explained_ratio double"
    if not cov_rows:
        return spark.createDataFrame([], schema)
    d = max(r["dim_j"] for r in cov_rows) + 1
    c = [[0.0] * d for _ in range(d)]
    for r in cov_rows:
        c[r["dim_i"]][r["dim_j"]] = r["cov"]
        c[r["dim_j"]][r["dim_i"]] = r["cov"]
    v = [1.0 / math.sqrt(d)] * d
    for _ in range(iters):
        w = [_seq_dot(row, v) for row in c]
        nrm = math.sqrt(_seq_dot(w, w))
        if nrm != 0.0:  # all-zero covariance: keep the previous vector
            v = [x / nrm for x in w]
    lam = _seq_dot(v, [_seq_dot(row, v) for row in c])
    trace = _seq_dot([c[i][i] for i in range(d)], [1.0] * d)
    ratio = lam / trace if trace != 0.0 else 0.0
    out = spark.createDataFrame(
        [(i, v[i], lam, ratio) for i in range(d)], schema
    )
    return out.select(
        "dim",
        q6(F.col("loading")).alias("loading"),
        q6(F.col("eigenvalue")).alias("eigenvalue"),
        q6(F.col("explained_ratio")).alias("explained_ratio"),
    )


def pca_power_pinned_sql(iters: int = PCA_POWER_ITERS) -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    return f"""
WITH RECURSIVE cov AS ({embedding_covariance_sql()}),
fullcov AS (
  SELECT dim_i, dim_j, cov FROM cov
  UNION ALL
  SELECT dim_j AS dim_i, dim_i AS dim_j, cov FROM cov WHERE dim_i <> dim_j
),
crow AS (
  SELECT dim_i, list(cov ORDER BY dim_j) AS row FROM fullcov GROUP BY dim_i
),
dd AS (SELECT COUNT(*) AS d FROM crow),
it(n, v) AS (
  SELECT 0, (SELECT list_transform(range(dd.d),
                                   x -> CAST(1.0 AS DOUBLE) / sqrt(dd.d))
             FROM dd)
  UNION ALL
  SELECT n + 1,
    (WITH w AS (SELECT list(list_dot_product(c.row, it.v) ORDER BY c.dim_i)
                AS w FROM crow c),
          nrm AS (SELECT sqrt(list_dot_product(w.w, w.w)) AS m FROM w)
     SELECT CASE WHEN nrm.m = 0 THEN it.v
                 ELSE list_transform(w.w, x -> x / nrm.m) END
     FROM w, nrm)
  FROM it WHERE n < {iters}
),
vf AS (SELECT v FROM it WHERE n = {iters}),
wf AS (
  SELECT (SELECT list(list_dot_product(c.row, vf.v) ORDER BY c.dim_i)
          FROM crow c) AS w
  FROM vf
),
lam AS (SELECT list_dot_product(vf.v, wf.w) AS eigval FROM vf, wf),
tr AS (
  SELECT list_dot_product(
           (SELECT list(cov ORDER BY dim_i) FROM cov WHERE dim_i = dim_j),
           (SELECT list_transform(range(dd.d), x -> CAST(1.0 AS DOUBLE))
            FROM dd)) AS total
),
dims AS (SELECT UNNEST(range(dd.d)) AS i FROM dd)
SELECT CAST(dims.i AS INT) AS dim,
       {q6_sql("vf.v[dims.i + 1]")} AS loading,
       {q6_sql("lam.eigval")} AS eigenvalue,
       {q6_sql("CASE WHEN tr.total = 0 THEN 0.0 ELSE lam.eigval / tr.total END")}
         AS explained_ratio
FROM dims, vf, lam, tr
"""


# ---------------------------------------------------------------------------
# k-NN outlier report — the embedding-space noise detector (kNN-distance
# outlier scoring, Ramaswamy et al. 2000 posture): a vector whose k
# nearest in-bucket neighbors are all far (low mean cosine), or that has
# FEWER than k in-bucket candidates at all, is an isolate — OCR junk, a
# wrong-modality embedding, or a mis-normalized batch — and gets flagged
# before it poisons contrastive sampling or coverage-weighted mixtures.
# Rides the SAME bucket-blocked knn_graph relation as pagerank_pinned
# (n·k rows, never a corpus²); the report is one vec_id-keyed rollup +
# a left join back to the corpus id set so bucket-singletons (k_found=0)
# surface instead of vanishing. Determinism: q6 cosines in, and the
# mean is round_even(SUM/COUNT, 4) — the house rule for small float
# folds (sum order over ≤k values).


def knn_outlier_report(
    embeddings: DataFrame, k: int = KNN_K, n_planes: int = BUCKET_DIMS
) -> DataFrame:
    """Per-vector isolation report: (vec_id, k_found, mean_neighbor_cos,
    isolated). ``isolated`` = fewer than k in-bucket neighbors;
    ``mean_neighbor_cos`` NULL for bucket-singletons."""
    g = knn_graph(embeddings, k, n_planes)
    per = g.groupBy("vec_id").agg(
        F.count(F.lit(1)).alias("k_found"),
        F.bround(F.sum("cosine") / F.count(F.lit(1)), 4).alias("mean_neighbor_cos"),
    )
    return (
        embeddings.select("vec_id")
        .join(per, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("k_found", F.lit(0)).cast("long").alias("k_found"),
            "mean_neighbor_cos",
            (F.coalesce("k_found", F.lit(0)) < k).alias("isolated"),
        )
    )


def knn_outlier_report_sql(k: int = KNN_K, n_planes: int = BUCKET_DIMS) -> str:
    return f"""
WITH g AS ({knn_graph_sql(k, n_planes)}),
per AS (
  SELECT vec_id, COUNT(*) AS k_found,
         round_even(SUM(cosine) / COUNT(*), 4) AS mean_neighbor_cos
  FROM g GROUP BY vec_id
)
SELECT e.vec_id,
       COALESCE(per.k_found, 0) AS k_found,
       per.mean_neighbor_cos,
       COALESCE(per.k_found, 0) < {k} AS isolated
FROM (SELECT vec_id FROM embeddings) e
LEFT JOIN per ON per.vec_id = e.vec_id
"""


# ---------------------------------------------------------------------------
# Label-centroid confusion — the label-space health check: per-label mean
# embedding (exact integer folds, the kmeans_update discipline), then
# pairwise cosines between label centroids. Two labels whose centroids
# are near-parallel are confusable (mislabeled slices, duplicated
# classes, or a collapsed embedding space) — checked before the labels
# drive stratified sampling or filtered ANN. Scale: the corpus-sized
# work is ONE map-side-combined (label, dim) integer fold (rows =
# labels·d); the pairwise stage is labels², a driver-scale relation.
# Determinism: quantized int64 coordinate sums are order-independent;
# each centroid coordinate is one exact division; the cosine folds
# fixed-order lists (vec_dot ≡ list_dot_product, bit-identical), q6 out.


def label_centroid_confusion(embeddings: DataFrame) -> DataFrame:
    """Pairwise label-centroid cosines: (label_a, label_b, n_a, n_b,
    cosine), label_a < label_b, q6."""
    from flink_streaming_etl_spark.functions import q6, vec_dot

    e = embeddings.select(
        "label", F.col("embedding").cast("array<double>").alias("v")
    )
    xq = F.floor(F.col("x") * F.lit(COV_QUANT)).cast("long")
    sums = (
        e.select("label", F.posexplode("v").alias("dim", "x"))
        .select("label", "dim", xq.alias("xq"))
        .groupBy("label", "dim")
        .agg(F.sum("xq").alias("sq"), F.count(F.lit(1)).alias("n"))
    )
    cents = (
        sums.select(
            "label",
            "n",
            F.struct(F.col("dim"), (F.col("sq") / (F.col("n") * F.lit(COV_QUANT))).alias("c")).alias("dc"),
        )
        .groupBy("label", "n")
        .agg(F.transform(F.sort_array(F.collect_list("dc")), lambda s: s["c"]).alias("cv"))
    )
    a = cents.select(F.col("label").alias("label_a"), F.col("n").alias("n_a"), F.col("cv").alias("va"))
    b = cents.select(F.col("label").alias("label_b"), F.col("n").alias("n_b"), F.col("cv").alias("vb"))
    dot = vec_dot(F.col("va"), F.col("vb"))
    na = F.sqrt(vec_dot(F.col("va"), F.col("va")))
    nb = F.sqrt(vec_dot(F.col("vb"), F.col("vb")))
    return (
        a.join(b, F.col("label_a") < F.col("label_b"))
        .select(
            "label_a", "label_b", "n_a", "n_b",
            q6(dot / (na * nb)).alias("cosine"),
        )
    )


def label_centroid_confusion_sql() -> str:
    from flink_streaming_etl_spark.functions import q6_sql

    q = COV_QUANT
    cos = q6_sql(
        "list_dot_product(a.cv, b.cv) / "
        "(sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv)))"
    )
    return f"""
WITH xq AS (
  SELECT label, i - 1 AS dim,
         CAST(floor(CAST(embedding[i] AS DOUBLE) * {q}) AS BIGINT) AS xq
  FROM embeddings, LATERAL (
    SELECT UNNEST(range(1, len(embedding) + 1)) AS i
  ) r
),
sums AS (
  SELECT label, dim, CAST(SUM(xq) AS BIGINT) AS sq, COUNT(*) AS n
  FROM xq GROUP BY label, dim
),
cents AS (
  SELECT label, n, list(sq::DOUBLE / (n * {q}) ORDER BY dim) AS cv
  FROM sums GROUP BY label, n
)
SELECT a.label AS label_a, b.label AS label_b,
       a.n AS n_a, b.n AS n_b, {cos} AS cosine
FROM cents a JOIN cents b ON a.label < b.label
"""


# ---------------------------------------------------------------------------
# Graph-expanded ANN — the graph-based retrieval augmentation (the idea
# behind HNSW/NSG neighborhoods, in its one-hop distributed form):
# sign-bucket candidates miss true neighbors that fall across an orthant
# boundary; expanding each bucket candidate through neighbor-graph edges
# pulls in the neighbors-of-candidates, and an exact full-precision
# rerank keeps top-k. CRITICAL DESIGN POINT: the expansion graph must be
# built at COARSER buckets than the query tier (graph_planes =
# n_planes − 3 here), otherwise every edge stays inside the query's own
# fine bucket and the expansion is a no-op — a coarse-graph edge is
# exactly what carries a candidate across a fine-bucket boundary.
# Recall then dominates the plain bucket tier (candidate superset by
# construction) and genuinely adds cross-bucket true neighbors (both
# pinned in tests). Scale: candidates per query = fine-bucket population
# + k·that, never corpus²; the coarse graph is n·k rows, bucket-blocked
# at 2^graph_planes orthants. Deterministic: q6, (cosine DESC, id) ties.


def ann_graph_expand(
    embeddings: DataFrame,
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_planes: int = BUCKET_DIMS,
    graph_k: int = KNN_K,
    graph_planes: int | None = None,
) -> DataFrame:
    """Top-k per query over bucket candidates ∪ their one-hop knn_graph
    neighbors, exact-cosine reranked: (query_id, neighbor_id, cosine,
    rank)."""
    from pyspark.sql.window import Window

    from flink_streaming_etl_spark.functions import q6, vec_dot

    e = (
        _as_double(embeddings)
        .withColumn("bucket", _bucket_expr_spark(n_planes))
        .withColumn("norm", vec_norm_col())
    )
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qn"),
        "bucket",
    )
    # stage 1: same-bucket candidates
    cand0 = q.join(
        e.select(F.col("vec_id").alias("cand_id"), "bucket"), ["bucket"]
    ).select("query_id", "cand_id")
    # stage 2: one-hop expansion through the COARSE-bucket knn graph
    if graph_planes is None:
        graph_planes = max(1, n_planes - 3)
    edges = memo_persist(
        "graph_expand_edges",
        knn_graph(embeddings, graph_k, graph_planes).select(
            F.col("vec_id").alias("src"), F.col("neighbor_id").alias("dst")
        ),
    )
    expanded = cand0.join(edges, cand0["cand_id"] == edges["src"]).select(
        "query_id", F.col("dst").alias("cand_id")
    )
    cands = cand0.unionByName(expanded).distinct()
    # exact rerank
    scored = (
        cands.filter(F.col("cand_id") != F.col("query_id"))
        .join(q.select("query_id", "qv", "qn"), "query_id")
        .join(
            e.select(
                F.col("vec_id").alias("cand_id"),
                F.col("v").alias("cv"),
                F.col("norm").alias("cn"),
            ),
            "cand_id",
        )
        .select(
            "query_id",
            F.col("cand_id").alias("neighbor_id"),
            q6(vec_dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", F.col("rank").cast("long").alias("rank"))
    )


def ann_graph_expand_sql(
    k: int = TOP_K,
    n_queries: int = N_QUERIES,
    n_planes: int = BUCKET_DIMS,
    graph_k: int = KNN_K,
    graph_planes: int | None = None,
) -> str:
    if graph_planes is None:
        graph_planes = max(1, n_planes - 3)
    bucket = " || ".join(
        f"(CASE WHEN v[{i + 1}] >= 0 THEN '1' ELSE '0' END)"
        for i in range(n_planes)
    )
    cos = _COS_SQL.format(a="q.qv", b="c.v")
    return f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {bucket} AS bucket FROM embeddings
),
q AS (SELECT vec_id AS query_id, v AS qv, bucket FROM e WHERE vec_id < {n_queries}),
knn AS ({knn_graph_sql(graph_k, graph_planes)}),
edges AS (SELECT vec_id AS src, neighbor_id AS dst FROM knn),
cand0 AS (
  SELECT q.query_id, e.vec_id AS cand_id FROM q JOIN e ON e.bucket = q.bucket
),
cands AS (
  SELECT DISTINCT query_id, cand_id FROM (
    SELECT query_id, cand_id FROM cand0
    UNION ALL
    SELECT c.query_id, ed.dst AS cand_id FROM cand0 c JOIN edges ed ON ed.src = c.cand_id
  )
),
scored AS (
  SELECT cd.query_id, cd.cand_id AS neighbor_id, {cos} AS cosine
  FROM cands cd
  JOIN q ON q.query_id = cd.query_id
  JOIN e c ON c.vec_id = cd.cand_id
  WHERE cd.cand_id <> cd.query_id
)
SELECT query_id, neighbor_id, cosine, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# Graph clustering report — exact per-node triangle counts and local
# clustering coefficients over the (undirected) k-NN graph: the standard
# graph-structure health check for embedding spaces (high coefficient =
# tight near-dup cliques SemDeDup should fold; near-zero with high
# degree = hub/noise vectors — complements pagerank and knn_outlier on
# the SAME edge substrate). Exact arithmetic end to end: triangles are
# counted once under the a<b<c orientation (two edge joins closing a
# wedge — candidate volume Σ deg², bounded since the knn graph is
# ≤k-out-regular per bucket), degrees/wedges are integer counts, and
# the coefficient is one int/int division. Never corpus²; the edge list
# is the memoized expansion substrate.


def graph_clustering_report(
    embeddings: DataFrame, k: int = KNN_K, n_planes: int = BUCKET_DIMS
) -> DataFrame:
    """Per-node (node_id, degree, wedges, triangles, clustering_coeff)
    over the symmetrized knn graph; coefficient NULL for degree < 2."""
    g = knn_graph(embeddings, k, n_planes).select(
        F.col("vec_id").alias("u"), F.col("neighbor_id").alias("v")
    )
    und = (
        g.select(F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("node_id"))
        .unionAll(und.select(F.col("b").alias("node_id")))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tris = (
        e1.join(e2, "y")
        .join(e3, ["x", "z"])  # closing edge: triangle x<y<z counted once
        .select("x", "y", "z")
    )
    per_node = (
        tris.select(F.explode(F.array("x", "y", "z")).alias("node_id"))
        .groupBy("node_id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        deg.join(per_node, "node_id", "left")
        .select(
            "node_id",
            "degree",
            (F.col("degree") * (F.col("degree") - 1) / 2).cast("long").alias("wedges"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias("triangles"),
            F.when(
                F.col("degree") >= 2,
                F.coalesce("triangles", F.lit(0))
                / (F.col("degree") * (F.col("degree") - 1) / 2),
            ).alias("clustering_coeff"),
        )
    )


def graph_clustering_report_sql(
    k: int = KNN_K, n_planes: int = BUCKET_DIMS
) -> str:
    return f"""
WITH knn AS ({knn_graph_sql(k, n_planes)}),
und AS (
  SELECT DISTINCT LEAST(vec_id, neighbor_id) AS a,
                  GREATEST(vec_id, neighbor_id) AS b
  FROM knn
),
deg AS (
  SELECT node_id, COUNT(*) AS degree FROM (
    SELECT a AS node_id FROM und UNION ALL SELECT b AS node_id FROM und
  ) GROUP BY node_id
),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM und e1
  JOIN und e2 ON e2.a = e1.b
  JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
),
per_node AS (
  SELECT node_id, COUNT(*) AS triangles FROM (
    SELECT x AS node_id FROM tris
    UNION ALL SELECT y FROM tris
    UNION ALL SELECT z FROM tris
  ) GROUP BY node_id
)
SELECT d.node_id, d.degree,
       CAST(d.degree * (d.degree - 1) / 2 AS BIGINT) AS wedges,
       CAST(COALESCE(p.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2
            THEN COALESCE(p.triangles, 0) / (d.degree * (d.degree - 1) / 2.0)
       END AS clustering_coeff
FROM deg d LEFT JOIN per_node p ON p.node_id = d.node_id
"""
