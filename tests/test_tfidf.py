"""TF-IDF top-k terms (operators/tfidf.py): exact-integer scoring,
ranking determinism, DuckDB parity, smoothing edge cases."""
import math

import pytest

from outliertree_spark.operators.tfidf import tfidf_top_terms


def _df(spark):
    rows = [
        (1, "apple banana apple cherry"),
        (2, "banana banana durian"),
        (3, "apple elderberry elderberry elderberry"),
        (4, "cherry durian cherry durian cherry"),
        (5, ""),          # no tokens: no output rows
        (6, "apple"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def top(spark):
    return tfidf_top_terms(_df(spark), k=2).collect()


def test_scores_exact_integers(top):
    # N = 5 docs with tokens; recompute every score by hand
    df_by_term = {"apple": 3, "banana": 2, "cherry": 2, "durian": 2,
                  "elderberry": 1}
    for r in top:
        idf_fp = round(math.log((5 + 1) / (df_by_term[r.term] + 1)) * 1e6)
        assert r.score_fp == r.tf * idf_fp, r
        assert r.df == df_by_term[r.term]


def test_topk_and_tiebreak(top):
    got = {(r.doc_id, r.rank): r.term for r in top}
    # doc 1: apple tf=2 idf=ln(6/4); cherry tf=1 idf=ln(6/3); banana
    # tf=1 idf=ln(6/3) -> apple (810930) > banana == cherry (693147),
    # tie broken by term asc
    assert got[(1, 1)] == "apple" and got[(1, 2)] == "banana"
    # doc 3: elderberry tf=3 idf=ln(6/2) dominates
    assert got[(3, 1)] == "elderberry"
    assert 5 not in {d for d, _ in got}
    # k=2 respected, ranks contiguous from 1
    ranks = {}
    for (d, rk) in got:
        ranks.setdefault(d, []).append(rk)
    for d, rs in ranks.items():
        assert sorted(rs) == list(range(1, len(rs) + 1)) and len(rs) <= 2


def test_deterministic_under_repartition(spark, top):
    got = tfidf_top_terms(_df(spark).repartition(5), k=2).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, top))


def test_matches_duckdb(spark):
    import duckdb
    pdf = _df(spark).toPandas()
    got = sorted(map(tuple, tfidf_top_terms(_df(spark), k=3).collect()))
    want = sorted(map(tuple, duckdb.connect().execute(r"""
        WITH tr AS (
          SELECT doc_id, unnest(list_filter(
              regexp_split_to_array(trim(lower(text)), '\s+'),
              t -> t <> '')) AS term
          FROM pdf
        ), dt AS (
          SELECT doc_id, term, count(*) AS tf FROM tr
          GROUP BY doc_id, term
        ), dfreq AS (
          SELECT term, count(*) AS df FROM dt GROUP BY term
        ), n AS (
          SELECT count(DISTINCT doc_id) AS n_docs FROM dt
        ), scored AS (
          SELECT dt.doc_id, dt.term, dt.tf, dfreq.df,
                 dt.tf * CAST(round(ln((n.n_docs + 1.0) / (dfreq.df + 1.0))
                                    * 1000000.0) AS BIGINT) AS score_fp
          FROM dt JOIN dfreq USING (term) CROSS JOIN n
        )
        SELECT doc_id, term, tf, df, score_fp,
               CAST(row_number() OVER (PARTITION BY doc_id
                    ORDER BY score_fp DESC, term ASC) AS INTEGER) AS rank
        FROM scored QUALIFY rank <= 3
    """).fetchall()))
    assert got == want


def test_negative_idf_smoothing(spark):
    # a term in EVERY doc has idf ln(N+1 / N+1) = 0 -> score 0, still
    # rankable; nothing crashes on the smoothed boundary
    rows = [(i, "common uniq%d" % i) for i in range(4)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.doc_id, r.term): r.score_fp
           for r in tfidf_top_terms(d, k=2).collect()}
    for i in range(4):
        assert got[(i, "common")] == 0
        assert got[(i, "uniq%d" % i)] == round(math.log(5 / 2) * 1e6)
