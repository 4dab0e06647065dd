"""Cross-document exact paragraph deduplication (CCNet / Dolma style).

``dedup_paragraphs`` removes every occurrence of a repeated non-empty
paragraph except the globally FIRST one (smallest ``(doc_id, position)``)
and reassembles each document in order — the classic "dedup paragraphs"
stage of CCNet-family web pipelines.  It complements the two existing
line-level operators:

- ``boilerplate.remove_boilerplate`` drops lines repeated in >= N docs
  from EVERY document (threshold semantics, broadcastable set);
- this operator keeps exactly ONE copy of EVERY repeated paragraph
  (keep-first semantics), so the affected set is corpus-sized and can
  never be broadcast — the exchange is inherent to the semantics.

Scale shape (the part that matters at 100 TB): the first-occurrence
window runs on a PROJECTION ``(md5(paragraph), doc_id, position)`` — the
paragraph text never enters that exchange, only a 32-hex digest and two
integers per paragraph.  The loser positions are aggregated to one small
``array<int>`` per affected document and joined back to the corpus on
``doc_id``; removal itself is a row-local indexed ``filter`` over the
split array, fused into the scan.  So the text bytes cross the wire at
most once (the join), zero times when AQE turns the loser side into a
broadcast — versus twice for the naive window-over-paragraphs plan.
Paragraph identity is md5 (128-bit): at 10^12 documents the collision
odds are ~2^-64, the standard accepted risk for hash-identity dedup at
this scale (CCNet, Dolma, RefinedWeb all dedup by digest).

The reference has no multi-document text operator (it is a single-table
outlier detector); this module is part of the training-data-pipeline
surface the north rule adds on top of the ported semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _spread


def paragraph_rows(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", sep: str = "\n") -> DataFrame:
    """(id, pos, para): one row per paragraph with its 0-based position."""
    arr = F.split(F.col(text_col), sep)
    return _spread(df).select(F.col(id_col),
                              F.posexplode(arr).alias("pos", "para"))


def paragraph_stats(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", sep: str = "\n",
                    min_chars: int = 1) -> DataFrame:
    """Monitoring companion: (para, n_docs, n_occurrences) for repeated
    paragraphs (space-trimmed identity), smallest first occurrence shown.
    One hash aggregate, map-side combined; the exchange is
    distinct-paragraph-sized."""
    p = paragraph_rows(df, id_col, text_col, sep)
    t = F.trim(F.col("para"))
    return (p.filter(F.length(t) >= min_chars)
             .groupBy(t.alias("para"))
             .agg(F.count_distinct(id_col).alias("n_docs"),
                  F.count(F.lit(1)).alias("n_occurrences"))
             .filter(F.col("n_occurrences") > 1))


def dedup_paragraphs(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", sep: str = "\n",
                     out_col: str = "clean_text") -> DataFrame:
    """Keep-first global paragraph dedup.

    Adds ``out_col`` (the document with duplicate paragraphs removed,
    original bytes and order preserved for survivors) and
    ``n_paras_removed``.  Identity is the space-trimmed paragraph (md5);
    whitespace-only paragraphs are structure, not content, and are always
    kept.  The first occurrence globally — ordered by ``(doc_id, pos)`` —
    survives, including the case where one document repeats a paragraph
    internally (only its first copy stays).
    """
    arr = F.split(F.col(text_col), sep)
    paras = paragraph_rows(df, id_col, text_col, sep)
    t = F.trim(F.col("para"))
    # detection pass: text-free projection (digest + two ints per para)
    ne = (paras.filter(F.length(t) > 0)
               .select(F.col(id_col), "pos", F.md5(t).alias("_h")))
    w = Window.partitionBy("_h").orderBy(F.col(id_col).asc(),
                                         F.col("pos").asc())
    losers = (ne.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") > 1)
                .groupBy(id_col)
                .agg(F.collect_list("pos").alias("_rm")))
    out = df.join(losers, id_col, "left")
    rm = F.coalesce(F.col("_rm"), F.array().cast("array<int>"))
    # per-doc cost is O(paragraphs x removed) via array_contains — fine
    # for web documents (both factors are at most thousands); there is no
    # Catalyst binary search, and the alternative (explode + anti-join +
    # reassemble) would trade this row-local arithmetic for two more
    # corpus-wide text shuffles
    kept = F.filter(arr, lambda x, i: ~F.array_contains(rm, i))
    return (out.withColumn(out_col, F.array_join(kept, sep))
               .withColumn("n_paras_removed", F.size(rm).cast("long"))
               .drop("_rm"))
