"""Per-document TF-IDF top-k terms (keyword extraction).

Corpus-profiling / curation signal: the k most distinctive terms of
each document under smoothed TF-IDF.  Scoring is FIXED-POINT so the
ranking is engine-portable (the trick proven out by
operators/text.py::surprisal_scores_fp): each term's smoothed IDF
``ln((N+1)/(df+1))`` quantizes once to integer micro-nats, a doc-term
score is the exact integer ``tf * idf_fp``, and ties break on the term
string — so Spark, DuckDB and any partitioning produce the identical
top-k set and order.

Scale shape (10^12 docs):

- one (doc_id, term) count aggregate — map-side combined, the only
  corpus-sized exchange, carrying token strings + counts (never text);
- document frequencies reduce FROM that aggregate (vocabulary-sized);
- N (docs with tokens) is a single-row aggregate, broadcast;
- the df table joins back by broadcast (vocabulary-sized; for an
  open-web vocabulary apply the same Zipf-head restriction as
  unigram_lm_scores — profile the head, not the hapax tail);
- per-doc top-k is a row_number window over the (doc_id, term, score)
  aggregate — partitioned by doc_id, carrying counts only.

The reference has no keyword extraction (validation library); this is
a pipeline addition per the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_FP = 1_000_000.0  # micro-nat quantization, matches text.py fixed point


def tfidf_top_terms(df: DataFrame, k: int = 5, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Top-``k`` terms per document by (score_fp DESC, term ASC).

    Output: (id, term, tf, df, score_fp, rank) — ``score_fp`` is the
    exact integer ``tf * round(ln((N+1)/(df+1)) * 1e6)``; documents
    with no tokens emit no rows.  Deterministic under any
    partitioning (integer scores, total tie-break order)."""
    from .text import term_rows
    tr = term_rows(df, id_col, text_col)
    # the (doc, term) aggregate feeds THREE consumers (scored, df, N);
    # without a cut Catalyst re-inlines it into three full corpus scans
    # (verified on the executed plan).  Lazy localCheckpoint — the same
    # rule as the fingerprint/signature tables in text.py/dedup.py:
    # materialize the reduction once, every branch reads it.
    dt = (tr.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
            .localCheckpoint(eager=False))
    dfreq = dt.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = dt.select(id_col).distinct() \
               .agg(F.count(F.lit(1)).alias("_n"))
    idf_fp = F.round(F.log((F.col("_n").cast("double") + 1.0)
                           / (F.col("df").cast("double") + 1.0))
                     * F.lit(_FP)).cast("long")
    scored = (dt.join(F.broadcast(dfreq), "term")
                .crossJoin(F.broadcast(n_docs))
                .withColumn("score_fp", F.col("tf") * idf_fp))
    w = Window.partitionBy(id_col).orderBy(F.desc("score_fp"),
                                           F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k)
                  .select(id_col, "term", "tf", "df", "score_fp", "rank"))
