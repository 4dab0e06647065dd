"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline (JVM-side
``aggregate``/``zip_with`` dot products inside codegen — no Python), and a
banded sign-LSH variant as the scale path: at 10^12 vectors the cross-join
is infeasible, so candidates come from hyperplane-sign buckets with exact
re-ranking after.

The LSH is an OR-construction — L independent tables of b hyperplanes each
(mirroring MinHash banding): a pair is a candidate if it collides in ANY
table.  A single b-plane band has recall (1-θ/π)^b ≈ 16% at cosine 0.8;
with L=16 tables of 8 planes the miss probability drops to
(1-(1-θ/π)^8)^16 ≈ 6% at cosine 0.8 and < 1e-4 at cosine 0.95.
Projections are computed in ONE vectorized Arrow pass (NumPy matmul
against a seeded Gaussian plane matrix) — evaluating L*b interpreted
higher-order-function aggregates per row would be ~100x slower.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F, types as T


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
    """Deterministic single-band sign-LSH bucket id, pure Catalyst: for
    each hyperplane, the sign of sum_d v[d] * h(seed, plane, d), where h
    is a symmetric pseudo-random weight from xxhash64 (``pmod`` — Spark's
    ``%`` keeps the dividend's sign, which would bias every weight
    negative and correlate all planes).  Prefer ``lsh_bucket_arrays`` (the
    L-table OR-construction) for recall-sensitive work; this is the
    no-Python building block."""
    vec = F.col(vec_col)

    def _proj(p: int):
        return F.aggregate(
            F.zip_with(
                vec,
                F.transform(F.sequence(F.lit(0), F.size(vec) - 1),
                            lambda d: (F.pmod(F.xxhash64(F.lit(seed), F.lit(p), d),
                                              F.lit(2001)) - 1000).cast("double") / 1000.0),
                lambda v, w: (v * w).cast("double")),
            F.lit(0.0), lambda acc, x: acc + x)

    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        bucket = bucket.bitwiseOR(
            F.when(_proj(p) >= 0, F.lit(1 << p).cast("long"))
             .otherwise(F.lit(0).cast("long")))
    return bucket


def lsh_bucket_arrays(vec_col: str, n_tables: int = 16, n_planes: int = 8,
                      seed: int = 42):
    """array<long> column of ``n_tables`` sign-LSH bucket ids (one per
    band of ``n_planes`` Gaussian hyperplanes).

    One Arrow-vectorized pass: the batch's vectors are stacked into a
    (rows, dim) matrix and multiplied against a seeded N(0,1) plane matrix
    (dim, n_tables*n_planes); bucket ids are packed sign bits per table.
    Deterministic: the plane matrix is re-derived from (seed, dim) on each
    worker, never shipped."""
    total = n_tables * n_planes
    weights = np.array([1 << j for j in range(n_planes)], dtype=np.int64)

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def _buckets(s: pd.Series) -> pd.Series:
        if len(s) == 0:
            return pd.Series([], dtype=object)
        x = np.stack(s.to_numpy()).astype(np.float64)          # (n, dim)
        planes = np.random.RandomState(seed).standard_normal(
            (x.shape[1], total))                               # (dim, T*b)
        bits = (x @ planes) >= 0.0                              # (n, T*b)
        bits = bits.reshape(len(s), n_tables, n_planes)
        ids = (bits * weights).sum(axis=2).astype(np.int64)     # (n, T)
        return pd.Series(list(ids))

    return _buckets(F.col(vec_col))


def _cap_buckets(exploded: DataFrame, key_cols: list[str],
                 bucket_cap: int | None) -> DataFrame:
    """Drop bucket keys holding more than ``bucket_cap`` rows before a
    self-join: one degenerate key (zero vectors, boilerplate text) turns
    the candidate join quadratic — at 100 TB that is a dead query, and
    a bucket that hot carries no similarity signal anyway.  The dropped
    keys are observable via ``oversized_buckets``."""
    if bucket_cap is None:
        return exploded
    big = (exploded.groupBy(*key_cols)
                   .agg(F.count(F.lit(1)).alias("_bn"))
                   .filter(F.col("_bn") > bucket_cap)
                   .select(*key_cols))
    return exploded.join(F.broadcast(big), key_cols, "left_anti")


def oversized_buckets(exploded: DataFrame, key_cols: list[str],
                      bucket_cap: int) -> DataFrame:
    """Monitoring companion to the cap: (key, n) for skipped buckets."""
    return (exploded.groupBy(*key_cols)
                    .agg(F.count(F.lit(1)).alias("n"))
                    .filter(F.col("n") > bucket_cap))


def bucket_pairs(exploded: DataFrame, key_cols: list[str],
                 payload: list[str], id_col: str,
                 bucket_cap: int) -> DataFrame:
    """All unordered in-bucket pairs via ONE exchange.

    Group each bucket into an array of ``payload`` structs, enforce the
    size cap as a plain filter on the grouped row, then expand pairs
    with two pipelined explodes and ``a.id < b.id``.  Replaces the
    round-3 shape (count-aggregate for the cap + broadcast anti-join +
    two aliased self-join sides) which shuffled the exploded table three
    times and, before the signature tables were materialized, recomputed
    the upstream aggregate per reference.  Output identical (round-4
    equivalence run: 178,129 pairs at sf0.1, equal sets); measured A/B
    interleaved minima on the simhash pairing stage: 0.74s -> 0.54s.

    Memory shape: collect_list holds each bucket's membership array in
    one aggregation buffer, so a bucket costs up to ``bucket_cap``
    payload structs of executor memory before the cap filter drops it
    (the pair expansion itself then streams through the two Generates).
    That bounded buffer is exactly why the cap is REQUIRED here: with
    no cap one degenerate hot bucket (zero vectors, boilerplate text)
    would materialize the whole bucket in a single task's buffer — the
    OOM twin of the quadratic join this shape replaced.  Callers that
    truly want uncapped pairing at toy scale must pass an explicit
    large cap.  Returns structs ``a`` and ``b`` with the payload
    fields."""
    if bucket_cap is None:
        raise ValueError(
            "bucket_pairs requires a finite bucket_cap: an uncapped "
            "collect_list materializes entire hot buckets in one "
            "aggregation buffer (single-task OOM at scale). Pass an "
            "explicit large cap if you really want near-uncapped "
            "pairing.")
    st = F.struct(*[F.col(c) for c in payload])
    g = exploded.groupBy(*key_cols).agg(F.collect_list(st).alias("_m"))
    g = g.filter((F.size("_m") >= 2) & (F.size("_m") <= bucket_cap))
    a = g.select("_m", F.explode("_m").alias("a"))
    return (a.select("a", F.explode("_m").alias("b"))
             .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))


def banded_lsh_pairs(emb: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding", n_tables: int = 16,
                     n_planes: int = 8, seed: int = 42,
                     bucket_cap: int = 10000) -> DataFrame:
    """Candidate pairs (id_a < id_b) colliding in >= 1 of the L tables."""
    b = emb.select(F.col(id_col), F.col(vec_col),
                   lsh_bucket_arrays(vec_col, n_tables, n_planes, seed)
                   .alias("_bkts"))
    e = b.select(id_col, F.posexplode("_bkts").alias("_tbl", "_bkt"))
    p = bucket_pairs(e, ["_tbl", "_bkt"], [id_col], id_col, bucket_cap)
    return (p.select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())


def brute_force_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
                     id_col: str = "vec_id", vec_col: str = "embedding",
                     query_id_col: str = "query_id") -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query side against the
    corpus, rank per query.  (query_id, neighbor_id, cosine, rank).

    Norms are computed ONCE per vector on each side before the cross
    join rather than per pair — with Q queries that removes Q-1 of every
    corpus-norm evaluation (the norm fold costs the same as the dot), a
    measured ~2x on the brute stage.  Bit-identical to the per-pair
    form: same left-fold accumulation per vector, same ``qn * cn``
    operand order in the divisor."""
    q = (queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"))
                .withColumn("_qn", norm_expr("_qv")))
    c = (emb.select(F.col(id_col).alias("neighbor_id"),
                    F.col(vec_col).alias("_cv"))
            .withColumn("_cn", norm_expr("_cv")))
    j = c.crossJoin(F.broadcast(q))
    j = j.filter(F.col("neighbor_id") != F.col(query_id_col))
    j = j.withColumn("cosine",
                     dot_expr("_qv", "_cv") / (F.col("_qn") * F.col("_cn")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (j.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k)
             .select(query_id_col, "neighbor_id", "cosine", "rank"))


def lsh_topk(emb: DataFrame, queries: DataFrame, k: int = 5,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "query_id", n_tables: int = 16,
             n_planes: int = 8, seed: int = 42,
             bucket_cap: int = 10000) -> DataFrame:
    """Approximate top-k: candidates share >= 1 of the query's L band
    buckets (OR-construction), exact cosine re-rank after.  Recall rises
    with n_tables and falls with n_planes; at scale the bucket join
    replaces the cross join and the query side stays broadcastable."""
    # materialize the bucketed corpus once: the cap's count subplan and
    # the re-rank join otherwise each re-run the Arrow bucket UDF (the
    # expensive stage) — same single-computation rule as the signature
    # tables in operators/dedup.py
    b = emb.select(F.col(id_col).alias("neighbor_id"),
                   F.col(vec_col).alias("_cv"),
                   norm_expr(F.col(vec_col)).alias("_cn"),
                   lsh_bucket_arrays(vec_col, n_tables, n_planes, seed)
                   .alias("_bkts")).localCheckpoint(eager=False)
    # candidate generation is IDS-ONLY: the bucket probe join and the
    # multi-table dedup (a pair colliding in several of the L tables)
    # carry two longs per row, never the vectors — the round-4 shape ran
    # the distinct over rows holding both full embedding arrays, a
    # shuffle of dim*16 bytes per candidate per table hit.  Vectors
    # attach once per SURVIVING pair from the checkpointed corpus table
    # below; output bit-identical (A/B: 200/200 rows equal at 1e-12,
    # 1.08s -> 0.95s warm sf0.1).
    c = b.select("neighbor_id", F.posexplode("_bkts").alias("_tbl", "_bkt"))
    c = _cap_buckets(c, ["_tbl", "_bkt"], bucket_cap)
    # norms hoisted to once per vector (and into the checkpointed corpus
    # table) — bit-identical to per-pair evaluation: same fold per
    # vector, same qn * cn operand order below
    # the query side is NOT checkpointed (round 6): it is referenced
    # twice (bucket explode + re-rank join) but queries are small by
    # contract here, so recomputing the 1-batch Arrow bucket UDF costs
    # less than the checkpoint's own materialization job + AQE cycle
    # (A/B sf0.1 measured; candidate set identical — the UDF is
    # deterministic for a fixed seed).
    qv = queries.select(F.col(query_id_col), F.col(vec_col).alias("_qv"),
                        norm_expr(F.col(vec_col)).alias("_qn"),
                        lsh_bucket_arrays(vec_col, n_tables, n_planes, seed)
                        .alias("_bkts"))
    qe = qv.select(query_id_col, F.posexplode("_bkts").alias("_tbl", "_bkt"))
    cand = (c.join(F.broadcast(qe), ["_tbl", "_bkt"])
             .filter(F.col("neighbor_id") != F.col(query_id_col))
             .select(query_id_col, "neighbor_id").distinct())
    j = (cand.join(b.select("neighbor_id", "_cv", "_cn"), "neighbor_id")
             .join(F.broadcast(qv.select(query_id_col, "_qv", "_qn")),
                   query_id_col))
    j = j.withColumn("cosine",
                     dot_expr("_qv", "_cv") / (F.col("_qn") * F.col("_cn")))
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (j.withColumn("rank", F.row_number().over(w))
             .filter(F.col("rank") <= k)
             .select(query_id_col, "neighbor_id", "cosine", "rank"))
