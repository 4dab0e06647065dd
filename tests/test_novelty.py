"""k-gram novelty scores (text.novelty_scores): hand-computed ratios,
flavor equivalence, repartition determinism, short-doc exclusion."""
import pytest
from pyspark.sql import functions as F

from outliertree_spark.operators.text import novelty_scores


def _df(spark):
    rows = [
        (1, "the quick brown fox jumps"),          # all grams first here
        (2, "the quick brown fox runs fast"),      # shares 2 of 4 grams
        (3, "the quick brown fox jumps"),          # exact dup of doc 1
        (4, "entirely different words here now"),  # all novel
        (5, "too short"),                          # < 3 tokens: no rows
        (6, ""),                                   # empty: no rows
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def nov(spark):
    return {r.doc_id: r for r in novelty_scores(_df(spark), k=3).collect()}


def test_hand_computed(nov):
    # doc 1: 3 grams, all first-seen -> 1.0
    assert (nov[1].n_grams, nov[1].novel_grams) == (3, 3)
    # doc 2: grams = [the quick brown, quick brown fox, brown fox runs,
    # fox runs fast]; first two owned by doc 1 -> 2/4
    assert (nov[2].n_grams, nov[2].novel_grams) == (4, 2)
    assert nov[2].novelty_ratio == 0.5
    # doc 3: exact dup of doc 1 -> 0 novel
    assert (nov[3].n_grams, nov[3].novel_grams) == (3, 0)
    assert nov[3].novelty_ratio == 0.0
    # doc 4: all its own
    assert (nov[4].n_grams, nov[4].novel_grams) == (3, 3)


def test_short_and_empty_docs_excluded(nov):
    assert 5 not in nov and 6 not in nov


def test_hash_flavor_equivalent(spark, nov):
    got = {r.doc_id: r for r in
           novelty_scores(_df(spark), k=3,
                          hash_kind="xxhash64").collect()}
    assert {d: (r.n_grams, r.novel_grams) for d, r in got.items()} \
        == {d: (r.n_grams, r.novel_grams) for d, r in nov.items()}


def test_deterministic_under_repartition(spark, nov):
    got = {r.doc_id: (r.n_grams, r.novel_grams, r.novelty_ratio)
           for r in novelty_scores(_df(spark).repartition(5),
                                   k=3).collect()}
    assert got == {d: (r.n_grams, r.novel_grams, r.novelty_ratio)
                   for d, r in nov.items()}


def test_exchange_carries_gram_key_not_text(spark):
    """Plan guard: the gram-window exchange partitions on the gram key;
    'text' never appears in an Exchange key list or a Sort key list."""
    import re
    out = novelty_scores(_df(spark), k=3, hash_kind="xxhash64")
    plan = out._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), plan
    for m in re.finditer(r"Sort \[([^\]]*)\]", plan):
        assert "text" not in m.group(1), plan
