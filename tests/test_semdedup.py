"""SemDeDup semantic dedup: the dominance rule vs a NumPy all-pairs
re-computation, and the kept/removed partition invariant."""
import numpy as np
import pytest

from pyspark.sql import functions as F, types as T


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType()))])
    return spark.createDataFrame(rows, schema)


def _fixture_vecs(seed=7, n=40, dim=16, n_groups=5):
    """Random unit-ish vectors plus planted near-dup groups: for each of
    the first n_groups base vectors, two perturbed copies appended."""
    rng = np.random.RandomState(seed)
    base = rng.randn(n, dim)
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    extra = []
    for g in range(n_groups):
        for rep in (1, 2):
            v = base[g] + 0.02 * rep * rng.randn(dim)
            extra.append(v / np.linalg.norm(v))
    return np.vstack([base, np.array(extra)])


def _expected_removed(vecs, eps):
    """All-pairs dominance rule: drop i iff exists j < i with
    cos(i, j) >= eps; report min such j and the max qualifying cosine."""
    x = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = x @ x.T
    out = {}
    for i in range(len(vecs)):
        doms = [j for j in range(i) if sims[i, j] >= eps]
        if doms:
            out[i] = (min(doms), round(max(sims[i, j] for j in doms), 4))
    return out


@pytest.mark.parametrize("eps", [0.95, 0.99])
def test_removed_matches_numpy_dominance(spark, eps):
    from outliertree_spark.operators.semdedup import semdedup_removed
    vecs = _fixture_vecs()
    df = _emb_df(spark, vecs)
    # n_assign=3 on a 50-vector corpus with 8 cells: every eps-pair
    # shares a cell (asserted by equality with the exact rule below)
    got = {r["vec_id"]: (r["dup_of"], r["max_cosine"])
           for r in semdedup_removed(df, eps=eps, k_cells=8, n_assign=3,
                                     sample_rows=1000).collect()}
    exp = _expected_removed(vecs, eps)
    assert set(got) == set(exp)
    for i, (dup_of, _) in exp.items():
        assert got[i][0] == dup_of
        assert got[i][1] == pytest.approx(exp[i][1], abs=2e-4)


def test_kept_removed_partition_ids(spark):
    from outliertree_spark.operators.semdedup import (semdedup,
                                                      semdedup_removed)
    vecs = _fixture_vecs()
    df = _emb_df(spark, vecs)
    kw = dict(eps=0.95, k_cells=8, n_assign=3, sample_rows=1000)
    kept = {r["vec_id"] for r in semdedup(df, **kw).select("vec_id")
            .collect()}
    removed = {r["vec_id"] for r in semdedup_removed(df, **kw)
               .select("vec_id").collect()}
    assert kept | removed == set(range(len(vecs)))
    assert kept & removed == set()
    assert removed  # the planted copies must actually be dropped


def test_no_dups_removes_nothing(spark):
    from outliertree_spark.operators.semdedup import semdedup_removed
    rng = np.random.RandomState(3)
    vecs = rng.randn(12, 8)
    df = _emb_df(spark, vecs)
    # random 8-dim gaussians: pairwise cosines are far below 0.99
    assert semdedup_removed(df, eps=0.99, k_cells=4, n_assign=2,
                            sample_rows=100).count() == 0
