"""Similarity search over the ``embeddings`` table (array<float> column).

Scale design:
- Brute-force top-k: the *query* side is tiny → broadcast it; the corpus
  scan is embarrassingly parallel, no shuffle except the final per-query
  top-k (a window over ~n_queries * corpus rows — at real scale replace
  with per-partition heap + re-rank; see tests/test_similarity.py).
- LSH-bucketed variant: sign-bit bucket key computed per-row, then a
  bucket-local self-join — candidate volume drops ~|buckets|x vs the full
  cross product. The scale path for all-pairs near-dup.

All vector math is JVM-side (`zip_with`/`aggregate` fold — sequential,
deterministic summation order) on array<double>; cosines are rounded to 6
decimals *before* any ranking/threshold so the DuckDB oracle (same fold
order via list_dot_product over DOUBLE[]) agrees bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from flink_streaming_etl_spark.functions import q6, vec_dot, vec_norm

N_QUERIES = 10  # vec_id < 10 are the probe vectors
TOP_K = 5
BUCKET_DIMS = 6  # sign bits of the first 6 dims → 64 buckets
EMBED_DIM = 64  # testdata embedding dimensionality (embeddings.parquet)

_COS_SQL = (
    "floor((list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))) * 1000000.0) / 1000000.0"
)


def _as_double(df: DataFrame) -> DataFrame:
    """vec_id, v (array<double>), norm — the norm is materialized once per
    vector here so pair scoring pays one dot product, not three. The
    arithmetic (dot / (norm_a * norm_b)) is unchanged → oracle-identical."""
    # NOTE: the HOF fold is interpreted (no codegen) but still beats a flat
    # 64-term element_at expansion, whose generated method exceeds JIT limits.
    return df.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    ).withColumn("norm", vec_norm(F.col("v")))


def _pair_cos(va: str, na: str, vb: str, nb: str) -> F.Column:
    return q6(vec_dot(F.col(va), F.col(vb)) / (F.col(na) * F.col(nb)))


def cosine_topk(embeddings: DataFrame, k: int = TOP_K, n_queries: int = N_QUERIES) -> DataFrame:
    """Brute-force cosine top-k for the probe set (baseline ANN)."""
    e = _as_double(embeddings)
    q = e.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("norm").alias("qnorm"),
    )
    scored = (
        e.join(F.broadcast(q), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _pair_cos("qv", "qnorm", "v", "norm").alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
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


def embedding_neardup(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """All-pairs cosine near-duplicates (exact baseline; LSH variant below
    is the scale path)."""
    e = _as_double(embeddings)
    a = e.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"), F.col("norm").alias("na"))
    b = e.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"), F.col("norm").alias("nb"))
    return (
        a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", _pair_cos("va", "na", "vb", "nb").alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def embedding_neardup_sql(threshold: float = 0.4) -> str:
    cos = _COS_SQL.format(a="a.v", b="b.v")
    return f"""
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id, {cos} AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {cos} >= {threshold}
"""


def _bucket_expr_spark() -> F.Column:
    return F.concat(
        *[
            F.when(F.element_at(F.col("v"), i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(BUCKET_DIMS)
        ]
    )


def ann_lsh_bucketed(embeddings: DataFrame, threshold: float = 0.1) -> DataFrame:
    """Sign-bit LSH: bucket on the signs of the first ``BUCKET_DIMS``
    components, then exact cosine only within buckets (vectors in the same
    orthant are the high-cosine candidates)."""
    e = _as_double(embeddings).withColumn("bucket", _bucket_expr_spark())
    a = e.select(F.col("vec_id").alias("a_id"), F.col("v").alias("va"), F.col("norm").alias("na"), "bucket")
    b = e.select(F.col("vec_id").alias("b_id"), F.col("v").alias("vb"), F.col("norm").alias("nb"), "bucket")
    return (
        a.join(b, ["bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select(
            "a_id", "b_id", "bucket",
            _pair_cos("va", "na", "vb", "nb").alias("cosine"),
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
