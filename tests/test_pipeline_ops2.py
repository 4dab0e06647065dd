"""Round-2 pipeline operators: connected components, deterministic
sampling, vocabulary stats, repetition scores."""

import pytest

from pyspark.sql import functions as F

from outliertree_spark.operators.components import (connected_components,
                                                    duplicate_groups)
from outliertree_spark.operators.sampling import (hash_sample,
                                                  split_train_holdout,
                                                  stratified_sample)
from outliertree_spark.operators.text import (repetition_scores,
                                              vocab_term_stats,
                                              vocab_top_terms)

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------- CC

def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_cc_two_components_and_isolated_star(spark):
    # star {1,2,3,4} + chain {10,11,12} + pair {20,21}
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (11, 10), (11, 12), (21, 20)])
    got = {r["id"]: r["component"]
           for r in connected_components(e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10,
                   20: 20, 21: 20}


def test_cc_chain_needs_multiple_rounds(spark):
    # a path graph stresses the propagation depth (min must travel the
    # full chain); labels converge to the chain head
    n = 12
    e = _edges(spark, [(i + 1, i) for i in range(n)])
    got = {r["id"]: r["component"]
           for r in connected_components(e).collect()}
    assert got == {i: 0 for i in range(n + 1)}


def test_cc_max_iter_guard(spark):
    # local_edges_cap=0 forces the distributed loop (the fast path
    # solves any bounded graph in one pass and never hits the guard)
    e = _edges(spark, [(1, 0), (2, 1), (3, 2), (4, 3)])
    with pytest.raises(RuntimeError):
        connected_components(e, max_iter=1, local_edges_cap=0)


def test_cc_fast_path_equals_distributed(spark):
    e = _edges(spark, [(1, 2), (1, 3), (1, 4), (11, 10), (11, 12),
                       (21, 20), (7, 6), (8, 7), (9, 8)])
    fast = {(r["id"], r["component"])
            for r in connected_components(e).collect()}
    dist = {(r["id"], r["component"])
            for r in connected_components(e, local_edges_cap=0).collect()}
    assert fast == dist
    # over-cap probe falls back to the distributed loop (round 6: the
    # cap now bounds the RAW pair probe, so 9 pairs overflow a cap of 8)
    over = {(r["id"], r["component"])
            for r in connected_components(e, local_edges_cap=8).collect()}
    assert over == dist
    # raw-pair probe at exactly the cap takes the fast path and agrees
    at_cap = {(r["id"], r["component"])
              for r in connected_components(e, local_edges_cap=9).collect()}
    assert at_cap == dist
    # duplicate pair rows count against the raw probe but cannot change
    # the labels on either path
    dup = e.union(e)
    got_dup = {(r["id"], r["component"])
               for r in connected_components(dup).collect()}
    assert got_dup == dist


def test_cc_null_endpoints_dropped_both_paths(spark):
    # rows with a NULL endpoint are filtered up front so the fast path
    # and the distributed loop agree (the loop's joins would silently
    # drop them; the union-find must not crash on None comparisons)
    e = spark.createDataFrame([(1, 2), (None, 3), (4, None)],
                              "id_a long, id_b long")
    expect = {(1, 1), (2, 1)}
    got_fast = {(r["id"], r["component"])
                for r in connected_components(e).collect()}
    got_dist = {(r["id"], r["component"])
                for r in connected_components(e, local_edges_cap=0).collect()}
    assert got_fast == expect
    assert got_dist == expect


def test_cc_fast_path_preserves_id_type(spark):
    e = spark.createDataFrame([("b", "a"), ("c", "b"), ("x", "y")],
                              "id_a string, id_b string")
    got = {r["id"]: r["component"]
           for r in connected_components(e).collect()}
    assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}
    assert dict(connected_components(e).dtypes) == {
        "id": "string", "component": "string"}


def test_duplicate_groups_summary(spark):
    e = _edges(spark, [(5, 9), (9, 7), (30, 31)])
    got = {r["component"]: (r["n_members"], r["keep_id"])
           for r in duplicate_groups(e).collect()}
    assert got == {5: (3, 5), 30: (2, 30)}


# ------------------------------------------- collapse-exact clustering

_TA = " ".join(f"w{i}" for i in range(20))          # 20 tokens
_TB = " ".join(f"w{i}" for i in range(19)) + " zz"  # Jaccard(TA,TB)=15/21


def _dup_docs(spark, n_a=5):
    rows = ([(100 + i, _TA) for i in range(n_a)]        # exact-dup group A
            + [(200 + i, _TB) for i in range(3)]        # group B, near-dup of A
            + [(300, "hi yo"), (301, "hi yo")]          # degenerate (<k tokens)
            + [(400, " ".join(f"x{i}" for i in range(20)))])  # singleton
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_near_dup_components_collapse_exact_equals_per_copy(spark):
    from outliertree_spark.operators.components import near_dup_components
    d = _dup_docs(spark)
    full = {(r["id"], r["component"])
            for r in near_dup_components(d).collect()}
    coll = {(r["id"], r["component"])
            for r in near_dup_components(d, collapse_exact=True).collect()}
    # A and B fuse into one component labeled by the global min id;
    # the degenerate pair (empty shingle sets -> NULL Jaccard) and the
    # singleton are absent from BOTH paths
    expect = {(i, 100) for i in (100, 101, 102, 103, 104, 200, 201, 202)}
    assert full == expect
    assert coll == expect


def test_near_dup_components_collapsed_survives_bucket_cap(spark):
    # a page duplicated past bucket_cap floods every one of its LSH
    # buckets in the per-copy pipeline (cap drops the bucket and ALL its
    # edges); collapsed, it is one band row and the clustering survives
    from outliertree_spark.operators.components import near_dup_components
    d = _dup_docs(spark, n_a=6)  # 6 A-copies + 3 B-copies > cap below
    full = {(r["id"], r["component"])
            for r in near_dup_components(d, bucket_cap=4).collect()}
    coll = {(r["id"], r["component"])
            for r in near_dup_components(d, collapse_exact=True,
                                         bucket_cap=4).collect()}
    # per-copy path: every bucket holding A's 6 copies exceeds the cap,
    # so the A group vanishes AND the surviving B cluster carries the
    # wrong (split) label
    assert full == {(i, 200) for i in (200, 201, 202)}
    assert coll == {(i, 100)
                    for i in (100, 101, 102, 103, 104, 105, 200, 201, 202)}


# ----------------------------------------------------------- sampling

@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_hash_sample_deterministic_and_unbiased(spark, docs):
    a = hash_sample(docs, 0.3, "doc_id")
    b = hash_sample(docs, 0.3, "doc_id")
    ids_a = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    ids_b = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # rerun-stable
    n = docs.count()
    assert 0.15 * n < len(ids_a) < 0.45 * n  # loose binomial bound
    # nested property: a 10% sample is a subset of the 30% sample
    ids_c = set(r["doc_id"] for r in
                hash_sample(docs, 0.1, "doc_id").select("doc_id").collect())
    assert ids_c <= set(ids_a)


def test_hash_sample_rate_edges(spark, docs):
    assert hash_sample(docs, 0.0, "doc_id").count() == 0
    assert hash_sample(docs, 1.0, "doc_id").count() == docs.count()


def test_hash_sample_md5_matches_xxhash_semantics(spark, docs):
    # different hashes select different rows but equivalent rates
    n = docs.count()
    m = hash_sample(docs, 0.5, "doc_id", hash_kind="md5_60").count()
    assert 0.3 * n < m < 0.7 * n


def test_stratified_sample_rates(spark, docs):
    out = stratified_sample(docs, "lang", {"en": 0.0}, "doc_id",
                            default_rate=1.0)
    langs = {r["lang"] for r in out.select("lang").distinct().collect()}
    assert "en" not in langs
    n_other = docs.filter(F.col("lang") != "en").count()
    assert out.count() == n_other


def test_split_train_holdout_no_straddle(spark, docs):
    # duplicate every doc_id via union: equal keys must share a split
    dup = docs.unionByName(docs)
    s = split_train_holdout(dup, 0.25, "doc_id")
    straddle = (s.groupBy("doc_id")
                 .agg(F.count_distinct("split").alias("k"))
                 .filter(F.col("k") > 1).count())
    assert straddle == 0
    n = docs.count()
    n_hold = s.filter("split = 'holdout'").count() // 2
    assert 0.1 * n < n_hold < 0.4 * n


# ----------------------------------------------------- vocab / repeat

def test_vocab_term_stats_tiny(spark):
    df = spark.createDataFrame(
        [(1, "a b a"), (2, "b c"), (3, "")],
        "doc_id long, text string")
    got = {r["term"]: (r["doc_freq"], r["term_freq"])
           for r in vocab_term_stats(df).collect()}
    assert got == {"a": (1, 2), "b": (2, 2), "c": (1, 1)}


def test_vocab_top_terms_total_order(spark):
    df = spark.createDataFrame(
        [(1, "x y"), (2, "x z"), (3, "y z")], "doc_id long, text string")
    rows = vocab_top_terms(df, n=2).collect()
    # all ties on (df, tf): alphabetical wins
    assert [r["term"] for r in rows] == ["x", "y"]


def test_repetition_scores_values(spark):
    df = spark.createDataFrame(
        [(1, "spam spam spam spam"),   # 3 bigrams, all "spam spam"
         (2, "all words are unique"),  # 3 distinct bigrams
         (3, "one"),                   # shorter than k
         (4, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], round(r["dup_gram_ratio"], 6))
           for r in repetition_scores(df, k=2).collect()}
    assert got[1] == (3, round(1 - 1 / 3, 6))
    assert got[2] == (3, 0.0)
    assert got[3] == (0, 0.0)
    assert got[4] == (0, 0.0)


def test_unigram_lm_scores_values(spark):
    import math
    from outliertree_spark.operators.text import unigram_lm_scores
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    # tf: a=2 b=2 c=1, total=5
    got = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}
    assert got[1]["n_tokens"] == 3 and got[1]["sum_tf"] == 6
    assert got[2]["n_tokens"] == 2 and got[2]["sum_tf"] == 3
    assert abs(got[1]["mean_logp"] - math.log(0.4)) < 1e-9
    assert abs(got[2]["mean_logp"]
               - (math.log(0.4) + math.log(0.2)) / 2) < 1e-9
    # surprisal ordering: the common-token doc scores higher
    assert got[1]["mean_logp"] > got[2]["mean_logp"]


def test_unigram_lm_head_and_oov_floor(spark):
    import math
    from outliertree_spark.operators.text import unigram_lm_scores
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string")
    # head covering the full vocab == exact path
    full = {r["doc_id"]: r for r in unigram_lm_scores(df).collect()}
    head3 = {r["doc_id"]: r
             for r in unigram_lm_scores(df, head_size=3).collect()}
    for k in (1, 2):
        assert head3[k]["sum_tf"] == full[k]["sum_tf"]
        assert abs(head3[k]["mean_logp"] - full[k]["mean_logp"]) < 1e-12
    # head of 1 keeps only the most frequent term ('a' by tf-then-name);
    # 'b'/'c' become OOV: floor logp ln(0.5/5), sum_tf counts them as 0
    h1 = {r["doc_id"]: r
          for r in unigram_lm_scores(df, head_size=1).collect()}
    assert h1[1]["sum_tf"] == 4            # a + a known, b OOV
    assert h1[2]["sum_tf"] == 0            # b + c both OOV
    floor = math.log(0.5 / 5)
    assert abs(h1[2]["mean_logp"] - floor) < 1e-9
    assert abs(h1[1]["mean_logp"]
               - (2 * math.log(0.4) + floor) / 3) < 1e-9


def test_winnowing_overlap_catches_partial_overlap(spark):
    """A shared paragraph inside otherwise-different documents links the
    pair (MOSS semantics); unrelated docs share nothing."""
    from outliertree_spark.operators.text import winnowing_overlap_pairs
    shared = "the quick brown fox jumps over the lazy dog again and again"
    df = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta " + shared),
         (2, shared + " one two three four five six seven eight nine"),
         (3, "totally different words nothing in common here at all "
             "more filler terms")],
        "doc_id long, text string")
    got = {(r.id_a, r.id_b): r.n_shared
           for r in winnowing_overlap_pairs(df, min_shared=2).collect()}
    assert (1, 2) in got and got[(1, 2)] >= 2
    assert all(3 not in pair for pair in got)
    # symmetric duplicates never emitted (id_a < id_b)
    assert all(a < b for a, b in got)
