"""Gopher-style document quality rules (Rae et al. 2021, "Scaling
Language Models: ... Gopher", Table A1) — the classic pre-training
corpus filter set, re-expressed as pure Catalyst column arithmetic.

Every rule is a deterministic function of one document's text, so the
whole operator is row-local: it runs inside the scan's whole-stage
codegen with no exchange, no UDF, and no state — the shape that scales
to 10^12 documents (cost is exactly one pass over the text bytes).

Extends the reference's "flag rows violating data-driven constraints"
model (outliertree's violation rows, /root/reference/src/predict.cpp)
with the declared-constraint rule set every web-scale training pipeline
applies before model-based filtering.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher's required-stopword list (Table A1: "contains at least 2 of
# the following English words")
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_features(df: DataFrame, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """Per-document Gopher filter features, all row-local.

    Columns added (names mirror the paper's rule inputs):

    - ``n_words``            word count (whitespace tokens)
    - ``mean_word_len``      mean characters per word
    - ``symbol_word_ratio``  ('#' chars + '...' + '…' occurrences) / words
    - ``bullet_line_frac``   fraction of lines starting with a bullet
    - ``ellipsis_line_frac`` fraction of lines ending with an ellipsis
    - ``alpha_word_frac``    fraction of words containing a letter
    - ``n_stop_hits``        how many of the 8 required stopwords appear

    All ratios are exact-integer divisions (count/count), so they are
    bit-identical across engines — the DuckDB oracle compares them
    unrounded and the rule booleans can never flip on float noise.
    """
    c = F.col(text_col)
    words = F.filter(F.split(F.trim(c), r"\s+"), lambda w: F.length(w) > 0)
    n_words = F.size(words)
    word_chars = F.aggregate(words, F.lit(0).cast("long"),
                             lambda acc, w: acc + F.length(w))
    mean_word_len = F.when(n_words > 0,
                           word_chars.cast("double") / n_words.cast("double")
                           ).otherwise(F.lit(0.0))

    n_hash = F.length(c) - F.length(F.regexp_replace(c, r"#", ""))
    # non-overlapping '...' occurrences + one per '…' character
    n_dots = (F.length(c)
              - F.length(F.regexp_replace(c, r"\.\.\.", ""))) / F.lit(3)
    n_uell = F.length(c) - F.length(F.regexp_replace(c, r"…", ""))
    symbol_ratio = F.when(
        n_words > 0,
        (n_hash + n_dots + n_uell).cast("double") / n_words.cast("double")
    ).otherwise(F.lit(0.0))

    lines = F.split(c, r"\n")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]")))
    ellipsis = F.size(F.filter(
        lines, lambda l: l.rlike(r"(\.\.\.|…)\s*$")))
    bullet_frac = F.when(n_lines > 0,
                         bullet.cast("double") / n_lines.cast("double")
                         ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(n_lines > 0,
                           ellipsis.cast("double") / n_lines.cast("double")
                           ).otherwise(F.lit(0.0))

    alpha = F.size(F.filter(words, lambda w: w.rlike(r"[A-Za-z]")))
    alpha_frac = F.when(n_words > 0,
                        alpha.cast("double") / n_words.cast("double")
                        ).otherwise(F.lit(0.0))

    lower_words = F.transform(words, F.lower)
    stop_hits: Column = F.lit(0)
    for w in GOPHER_STOPWORDS:
        stop_hits = stop_hits + F.array_contains(lower_words,
                                                 w).cast("int")

    return (df.withColumn("n_words", n_words.cast("long"))
              .withColumn("mean_word_len", mean_word_len)
              .withColumn("symbol_word_ratio", symbol_ratio)
              .withColumn("bullet_line_frac", bullet_frac)
              .withColumn("ellipsis_line_frac", ellipsis_frac)
              .withColumn("alpha_word_frac", alpha_frac)
              .withColumn("n_stop_hits", stop_hits))


def gopher_rules(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_mean_word_len: float = 3.0,
                 max_mean_word_len: float = 10.0,
                 max_symbol_word_ratio: float = 0.1,
                 max_bullet_line_frac: float = 0.9,
                 max_ellipsis_line_frac: float = 0.3,
                 min_alpha_word_frac: float = 0.8,
                 min_stop_hits: int = 2) -> DataFrame:
    """Apply the Gopher rule thresholds: per-rule booleans plus the
    conjunction ``gopher_keep``.  Defaults are the paper's values.

    Returns (id, the seven feature columns, seven rule booleans,
    gopher_keep).  Rule booleans compare exact-integer-derived doubles
    against literal thresholds, so they are engine-portable with no
    rounding epsilon."""
    feats = gopher_features(df, id_col, text_col)
    r_words = (F.col("n_words") >= min_words) & \
              (F.col("n_words") <= max_words)
    r_wlen = (F.col("mean_word_len") >= min_mean_word_len) & \
             (F.col("mean_word_len") <= max_mean_word_len)
    r_symbol = F.col("symbol_word_ratio") <= max_symbol_word_ratio
    r_bullet = F.col("bullet_line_frac") <= max_bullet_line_frac
    r_ellipsis = F.col("ellipsis_line_frac") <= max_ellipsis_line_frac
    r_alpha = F.col("alpha_word_frac") >= min_alpha_word_frac
    r_stop = F.col("n_stop_hits") >= min_stop_hits
    keep = (r_words & r_wlen & r_symbol & r_bullet & r_ellipsis
            & r_alpha & r_stop)
    return feats.select(
        F.col(id_col), "n_words", "mean_word_len", "symbol_word_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "n_stop_hits",
        r_words.alias("rule_word_count"),
        r_wlen.alias("rule_mean_word_len"),
        r_symbol.alias("rule_symbol_ratio"),
        r_bullet.alias("rule_bullet_lines"),
        r_ellipsis.alias("rule_ellipsis_lines"),
        r_alpha.alias("rule_alpha_words"),
        r_stop.alias("rule_stopwords"),
        keep.alias("gopher_keep"))
