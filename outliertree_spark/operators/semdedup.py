"""SemDeDup-style semantic deduplication over an embedding column.

Implements the published recipe (Abbas et al. 2023, "SemDeDup:
Data-efficient learning at web-scale through semantic deduplication"):
cluster the corpus embeddings with a cheap k-means coarse quantizer,
compare vectors only WITHIN a cluster, and drop every document whose
cosine similarity to another in-cluster document exceeds ``eps``,
keeping one representative per epsilon-neighborhood.

Keep rule — the parallel "dominance" variant: a document is removed iff
some SMALLER-id document sits within ``eps`` of it.  The paper's greedy
sequential sweep (a remover must itself be kept) needs an in-cluster
sequential pass; the dominance rule is order-free, one aggregation, and
removes a superset differing only on chains a < b < c where
cos(a,b) >= eps, cos(b,c) >= eps but cos(a,c) < eps — rare at the
high-eps settings the paper uses (0.95+), and the variant common in
parallel reimplementations.  Crucially it is exactly expressible in
plain SQL over the all-pairs cosine, which is what the DuckDB oracle
checks (q_semdedup): on the planted fixture the IVF-bucketed screen is
hash-identical to the exact dominance rule, proving the cluster
restriction lost no pair at that eps.

Shape at 100 TB: identical to the IVF near-dup path it reuses
(operators/ivf.py) — centroids are trained on a bounded driver sample
and ship in the Arrow UDF closure (a few KB, effectively a broadcast of
the whole "model"); cell assignment is one vectorized NumPy matmul
pass; the only exchange moves (cell, id) pairs, bucket-capped; exact
cosines are computed once per surviving candidate pair.  The removal
verdict is a groupBy on the pair's larger id with map-side combine; the
kept set is a left-anti join of the corpus against that (small) removed
set.  Nothing is ever all-pairs and no vector leaves the executor twice.

Reference anchor: this generalizes the reference's duplicate-row
screen (outliertree flags identical rows only via its categorical
proportion checks, /root/reference/src/fit_model.cpp) to semantic
near-duplicates, which the reference cannot express.
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame, functions as F

from .ivf import ivf_near_dups, train_centroids


def semdedup_removed(emb: DataFrame, id_col: str = "vec_id",
                     vec_col: str = "embedding", eps: float = 0.95,
                     k_cells: int = 64, n_assign: int = 2,
                     sample_rows: int = 20000, seed: int = 42,
                     bucket_cap: int = 10000,
                     centroids: np.ndarray | None = None) -> DataFrame:
    """Documents removed by semantic dedup: one row per dropped id with
    ``dup_of`` (the smallest dominating neighbor's id) and
    ``max_cosine`` (its closest dominating neighbor's cosine, rounded to
    4 places like the other cosine operators).

    Candidate pairs come from the IVF cell self-join (multi-assign
    ``n_assign`` cells per vector so epsilon-close vectors share a cell
    with high probability); each candidate is exact-cosine verified, so
    false positives are impossible and the only approximation is cell
    recall — gated by the same planted-fixture oracle as ivf_recall."""
    if centroids is None:
        centroids = train_centroids(emb, vec_col, k_cells, sample_rows,
                                    seed=seed)
    pairs = ivf_near_dups(emb, id_col=id_col, vec_col=vec_col,
                          min_cosine=eps, k_cells=k_cells,
                          n_assign=n_assign, sample_rows=sample_rows,
                          seed=seed, bucket_cap=bucket_cap,
                          centroids=centroids)
    # pairs carry id_a < id_b (bucket_pairs invariant), so the dominance
    # rule is a single aggregation on the larger side
    return (pairs.groupBy(F.col("id_b").alias(id_col))
                 .agg(F.min("id_a").alias("dup_of"),
                      F.round(F.max("cosine"), 4).alias("max_cosine")))


def semdedup(emb: DataFrame, id_col: str = "vec_id",
             vec_col: str = "embedding", eps: float = 0.95,
             k_cells: int = 64, n_assign: int = 2,
             sample_rows: int = 20000, seed: int = 42,
             bucket_cap: int = 10000,
             centroids: np.ndarray | None = None) -> DataFrame:
    """The kept corpus: ``emb`` minus the removed set (left-anti join on
    the id — the removed side is the small one, so at scale this is a
    broadcast anti-join under AQE)."""
    removed = semdedup_removed(emb, id_col, vec_col, eps, k_cells,
                               n_assign, sample_rows, seed, bucket_cap,
                               centroids)
    return emb.join(removed.select(id_col), id_col, "left_anti")
