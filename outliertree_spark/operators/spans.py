"""Exact duplicate-span (substring) deduplication.

The strongest-known training-data dedup removes repeated SUBSTRINGS, not
just whole documents or paragraphs (Lee et al., "Deduplicating Training
Data Makes Language Models Better", ACL 2022 — the ExactSubstr variant
built there on a suffix array).  A suffix array is not a Spark shape; the
standard distributed approximation is fixed-width rolling windows: every
``span_tokens``-token window of every document, keyed by its content, is
deduplicated globally with a keep-first rule, and tokens covered only by
loser windows are dropped from the rewritten text.  A repeated substring
of length >= span_tokens is covered by at least one duplicated window, so
the window family catches every long verbatim repeat; shorter repeats are
below the span width by construction (the same trade Lee et al. make with
their 50-token threshold).

Scale shape (the paragraph-dedup discipline, operators/paragraphs.py):

- windows are built ROW-LOCALLY from the token array (``transform`` over
  ``sequence`` — no exchange, no Window function);
- the global detection exchange carries ``(span_key, doc_id, pos)``
  ONLY — document text never shuffles.  The exchange is per-WINDOW
  (one fixed-width triple per corpus token), the inherent cost of
  substring-granular dedup (a suffix array touches every token too);
  at 100 TB that is ~24 bytes/token of narrow shuffle vs re-shipping
  the corpus itself, and the map-side-combinable keep-first aggregate
  reduces it before the wire where keys repeat within a partition;
- loser spans join back to their documents on ``doc_id`` (one shuffle of
  span positions, grouped to one array row per affected doc), and the
  removal itself is a row-local indexed ``filter`` over the token array;
- the rewritten corpus therefore never crosses the wire at all: text is
  read where it is scanned and rewritten in place.

``span_key`` flavors: ``"xx"`` (arithmetic ~2^40 rolling ids built from
per-token xxhash64 — cheapest, the 100 TB default; collision probability
per corpus pair ~ spans^2 / 2^41) and ``"md5"`` (md5 of the span STRING —
bit-for-bit reproducible in DuckDB, which is what makes the operator
SQL-oracleable; see __spark_entry__.q_span_dedup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .dedup import _spread, shingle_hash_array


def _token_col(text_col: str):
    return F.split(F.lower(F.trim(F.col(text_col))), r"\s+")


def _span_keys(text_col: str, span_tokens: int, kind: str):
    """Array column: one key per window position (size = n - W + 1)."""
    if kind == "xx":
        return shingle_hash_array(text_col, span_tokens)
    if kind == "md5":
        toks = _token_col(text_col)
        n = F.size(toks)
        idx = F.sequence(F.lit(0), n - span_tokens)
        sh = F.transform(
            idx, lambda i: F.md5(F.array_join(
                F.slice(toks, i + 1, span_tokens), " ")))
        return F.when(n >= span_tokens, sh) \
                .otherwise(F.array().cast("array<string>"))
    raise ValueError(f"unknown span key kind {kind!r} (use 'xx' or 'md5')")


def span_occurrences(df: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text", span_tokens: int = 8,
                     key_kind: str = "xx") -> DataFrame:
    """(key, doc_id, pos) for every ``span_tokens``-token window.

    ``pos`` is the 0-based token index of the window start.  The span
    table is cut from the optimizer with a lazy ``localCheckpoint``
    before the explode — the Generate would otherwise re-inline the
    window HOF chain into every position (the O(P^2) Catalyst pathology
    measured on winnowing, operators/text.py)."""
    d = (_spread(df)
         .select(F.col(id_col),
                 _span_keys(text_col, span_tokens, key_kind).alias("_k"))
         .localCheckpoint(eager=False))
    return d.select(F.col(id_col), F.posexplode("_k").alias("pos", "key"))


def duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text", span_tokens: int = 8,
                    key_kind: str = "xx") -> DataFrame:
    """Loser occurrences of globally duplicated spans.

    A span key occurring at >= 2 (doc_id, pos) sites keeps its smallest
    (doc_id, pos) occurrence; every other site is a loser row
    ``(doc_id, pos, key, n_sites)``.  ONE exchange, keyed on the span
    key, carrying (key, doc_id, pos) triples only: keep-first marking is
    a ``row_number`` over (key; doc_id, pos) and ``n_sites`` a ``count``
    over the same partition, which shares the window sort — the same
    shape as ``paragraphs.dedup_paragraphs``.  The round-5 form
    aggregated keys and joined the occurrence table back against the
    winners, which exchanged the per-window table TWICE (once into the
    aggregate, once into the join) and re-exploded the span arrays for
    the second pass; the window form exchanges and sorts it once
    (measured sf0.1 end-to-end: 1.61s -> ~1.1s warm, identical rows).
    Trade-off as documented in paragraphs.py: a span hotter than one
    task's partition share lands on a single task — acceptable because a
    span row is ~24 bytes and ubiquitous-boilerplate spans are capped
    upstream by document structure, the same argument the paragraph
    operator ships with."""
    occ = span_occurrences(df, id_col, text_col, span_tokens, key_kind)
    w = Window.partitionBy("key").orderBy(F.col(id_col).asc(),
                                          F.col("pos").asc())
    wc = Window.partitionBy("key")
    return (occ.withColumn("_rn", F.row_number().over(w))
               .withColumn("n_sites", F.count(F.lit(1)).over(wc))
               .filter(F.col("_rn") > 1)
               .select(id_col, "pos", "key", "n_sites"))


def remove_duplicate_spans(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", span_tokens: int = 8,
                           key_kind: str = "xx",
                           out_col: str = "text_dedup") -> DataFrame:
    """Rewrite each document with duplicated-span tokens removed.

    Token ``t`` of a document is dropped iff some loser window of that
    document covers it (``pos <= t < pos + span_tokens``).  The winner
    occurrence of every span survives somewhere in the corpus, so no
    content is lost globally — the keep-first rule of paragraph dedup
    applied at substring granularity.  Docs without loser spans (the
    overwhelming majority at scale) keep their text untouched via the
    null-array fast path.  Output: input columns plus ``out_col`` and
    ``n_tokens_removed``."""
    losers = (duplicate_spans(df, id_col, text_col, span_tokens, key_kind)
              .groupBy(id_col)
              .agg(F.collect_list("pos").alias("_loser_pos")))
    # project the token array to a COLUMN before the per-token transform:
    # a lambda body referencing the raw split() expression re-evaluates
    # the split per element (the O(P^2) Catalyst re-inline measured on
    # winnowing); the projection boundary pins it to once per row.
    # Rebuild tokens are the RAW (case-preserving) split — span identity
    # is case-insensitive, the rewrite is not lossy beyond the removal
    # (token boundaries are identical either way: lowering never changes
    # whitespace)
    j = (df.join(losers, id_col, "left")
           .withColumn("_toks",
                       F.split(F.trim(F.col(text_col)), r"\s+")))
    toks = F.col("_toks")
    # row-local removal: keep token i unless covered by a loser window.
    # _loser_pos is bounded by the doc's own window count, so the
    # exists() scan is O(tokens x doc_losers) within the row.
    kept = F.filter(
        F.transform(F.sequence(F.lit(0), F.size(toks) - 1),
                    lambda i: F.when(
                        F.exists("_loser_pos",
                                 lambda p: (p <= i)
                                 & (i < p + F.lit(span_tokens))),
                        F.lit(None).cast("string"))
                    .otherwise(F.get(toks, i))),
        lambda x: x.isNotNull())
    out = (j.withColumn("_kept", kept)
            .withColumn(
               out_col,
               F.when(F.col("_loser_pos").isNull(), F.col(text_col))
                .otherwise(F.array_join("_kept", " ")))
            .withColumn(
               "n_tokens_removed",
               F.when(F.col("_loser_pos").isNull(), F.lit(0))
                .otherwise(F.size(toks) - F.size("_kept"))
                .cast("long")))
    return out.drop("_loser_pos", "_toks", "_kept")
