"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline (JVM-side
``aggregate``/``zip_with`` dot products inside codegen — no Python), and a
sign-LSH bucketed variant as the scale path: at 10^12 vectors the
cross-join is infeasible, so candidates come from hyperplane-sign buckets
(broadcastable probe side), with exact re-ranking after.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dot_expr(a, b):
    return F.aggregate(
        F.zip_with(F.col(a) if isinstance(a, str) else a,
                   F.col(b) if isinstance(b, str) else b,
                   lambda x, y: (x * y).cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)


def norm_expr(a):
    c = F.col(a) if isinstance(a, str) else a
    return F.sqrt(F.aggregate(c, F.lit(0.0),
                              lambda acc, v: acc + (v * v).cast("double")))


def cosine_expr(a, b):
    return dot_expr(a, b) / (norm_expr(a) * norm_expr(b))


def sign_lsh_bucket(vec_col: str, n_planes: int = 8, seed: int = 42):
    """Deterministic sign-LSH bucket id: for each hyperplane, the sign of
    sum_d v[d] * h(seed, plane, d), where h is a unit-ish pseudo-random
    weight from xxhash64 — all in Catalyst, no shipped matrices."""
    vec = F.col(vec_col)

    def _proj(p: int):
        return F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda d: (F.xxhash64(F.lit(seed), F.lit(p), d)
                                       % 2001 - 1000).cast("double") / 1000.0),
                lambda v, w: (v * w).cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket.bitwiseOR(
            F.when(_proj(p) >= 0, F.lit(1 << p).cast("long"))
             .otherwise(F.lit(0).cast("long")))
    return bucket


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus, rank per query.  (query_id, neighbor_id, cosine, rank)."""
    q = queries.select(F.col(query_id_col),
                       F.col(vec_col).alias("_qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("_cv"))
    j = c.crossJoin(F.broadcast(q))
    j = j.filter(F.col("neighbor_id") != F.col(query_id_col))
    j = j.withColumn("cosine", cosine_expr("_qv", "_cv"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (j.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k)
             .select(query_id_col, "neighbor_id", "cosine", "rank"))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id",
             n_planes: int = 8, seed: int = 42) -> DataFrame:
    """Approximate top-k: candidates share the query's sign-LSH bucket,
    exact cosine re-rank inside the bucket.  Recall trades off with
    n_planes; at scale the bucket join replaces the cross join."""
    c = (emb.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("_cv"))
            .withColumn("_bkt", sign_lsh_bucket("_cv", n_planes, seed)))
    q = (queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
                .withColumn("_bkt", sign_lsh_bucket("_qv", n_planes, seed)))
    j = c.join(F.broadcast(q), "_bkt")
    j = j.filter(F.col("neighbor_id") != F.col(query_id_col))
    j = j.withColumn("cosine", cosine_expr("_qv", "_cv"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (j.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k)
             .select(query_id_col, "neighbor_id", "cosine", "rank"))
