"""Boilerplate line detection + removal (RefinedWeb/Gopher-style).

Web corpora repeat navigation/footer/cookie-banner lines across millions
of pages; dedup at document granularity never sees them.  The operator
pair here:

  * ``frequent_lines`` — line -> number of distinct docs containing it.
    The only exchange carries (line, partial-count) pairs with map-side
    partial aggregation; the corpus itself never shuffles.
  * ``remove_boilerplate`` — row-local removal against a driver-collected
    boilerplate set embedded as a literal array (the set is tiny: top-K
    frequent lines), so the cleaning pass is a pure map with NO shuffle
    and NO join.  At 10^12 docs this two-job shape (tiny agg output ->
    broadcast-by-literal map) beats an explode + anti-join + re-assemble
    plan, which would shuffle every line of the corpus on doc_id.

Lines are ``\\n``-separated; both hash flavors from the rest of the repo
apply (xxhash64 for scale, md5_60 for the DuckDB oracle).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, functions as F


def doc_lines(df: DataFrame, id_col: str = "doc_id",
              text_col: str = "text", min_len: int = 10) -> DataFrame:
    """(id, line): DISTINCT trimmed lines per doc, at least ``min_len``
    chars (short lines are too generic to call boilerplate)."""
    lines = F.array_distinct(
        F.transform(F.split(F.col(text_col), r"\n"), F.trim))
    return (df.select(F.col(id_col), F.explode(lines).alias("line"))
              .filter(F.length("line") >= min_len))


def frequent_lines(df: DataFrame, min_docs: int = 3,
                   id_col: str = "doc_id", text_col: str = "text",
                   min_len: int = 10) -> DataFrame:
    """(line, n_docs) for lines appearing in >= ``min_docs`` distinct
    docs.  Lines are distinct within a doc, so a plain count IS the
    distinct-doc count — no count_distinct shuffle amplification."""
    return (doc_lines(df, id_col, text_col, min_len)
            .groupBy("line")
            .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
            .filter(F.col("n_docs") >= min_docs))


def collect_boilerplate(df: DataFrame, min_docs: int = 3,
                        max_lines: int = 10000,
                        id_col: str = "doc_id", text_col: str = "text",
                        min_len: int = 10) -> list[str]:
    """Driver-side boilerplate set: top ``max_lines`` frequent lines by
    doc count (ties broken by line for determinism).  This is the ONLY
    collect in the pipeline and is bounded by ``max_lines``."""
    rows = (frequent_lines(df, min_docs, id_col, text_col, min_len)
            .orderBy(F.desc("n_docs"), "line")
            .limit(max_lines)
            .collect())
    return [r.line for r in rows]


# Above this set size the literal-array scan loses to the Arrow
# set-membership path (measured at sf0.1, see remove_boilerplate).
LITERAL_SET_MAX = 1000


def remove_boilerplate(df: DataFrame, boiler: list[str],
                       text_col: str = "text",
                       out_col: str = "clean_text",
                       method: str = "auto") -> DataFrame:
    """Remove boilerplate lines, preserving original line order, and
    report how many lines were dropped.  Both methods are shuffle-free
    maps; they differ only in per-line membership cost:

    * ``literal`` — pure-Catalyst: filter the doc's lines against a
      literal array of xxhash64 values.  ``array_contains`` on a
      literal array is a LINEAR scan, so per-line cost is O(|boiler|):
      fine for the usual top-100 set, a ~100x multiplier on the
      cleaning map at the old 10k default.
    * ``set`` — Arrow-vectorized: hashed O(1) membership against a
      Python frozenset shipped once per executor in the UDF closure.
      Per-line cost is flat in |boiler|.

    ``auto`` picks ``literal`` for sets up to ``LITERAL_SET_MAX`` (1000)
    and ``set`` beyond — measured at sf0.1 (cached input, min of 2):
    literal 0.23s / 0.38s / 1.99s at |set| = 100 / 1k / 10k, set path
    flat at 0.28-0.39s across all three — the crossover sits right at
    ~1k and the linear scan is ~6x slower by 10k.  Semantics are
    identical (equivalence-tested): split on newline, compare the
    space-trimmed line, join survivors."""
    if not boiler:
        return (df.withColumn(out_col, F.col(text_col))
                  .withColumn("n_lines_removed", F.lit(0).cast("long")))
    if method == "auto":
        method = "literal" if len(boiler) <= LITERAL_SET_MAX else "set"
    if method == "literal":
        bset = F.array(*[F.xxhash64(F.lit(b)) for b in boiler])
        lines = F.split(F.col(text_col), r"\n")
        kept = F.filter(
            lines,
            lambda ln: ~F.array_contains(bset, F.xxhash64(F.trim(ln))))
        return (df.withColumn(out_col, F.array_join(kept, "\n"))
                  .withColumn("n_lines_removed",
                              (F.size(lines) - F.size(kept)).cast("long")))

    from pyspark.sql import types as T
    from pyspark.sql.functions import pandas_udf

    bfroz = frozenset(boiler)
    out_schema = T.StructType([
        T.StructField("clean", T.StringType()),
        T.StructField("removed", T.LongType())])

    @pandas_udf(out_schema)
    def _clean(texts: pd.Series) -> pd.DataFrame:
        cleans, removed = [], []
        # Deliberately a Python loop: the "vectorized" alternative
        # (Series.str.split -> explode -> isin -> groupby join) measured
        # 5.3x SLOWER on a 5k-doc/10k-set batch (103ms vs 19ms, round 4)
        # because explode+groupby overhead dwarfs frozenset membership,
        # which is already C-speed per line.
        for t in texts:
            if t is None:
                cleans.append(None)
                removed.append(None)
                continue
            lines = t.split("\n")
            # mirror the Catalyst path exactly: membership tests the
            # SPACE-trimmed line (F.trim strips ' ' only), output keeps
            # the original untrimmed survivors in order
            kept = [ln for ln in lines if ln.strip(" ") not in bfroz]
            cleans.append("\n".join(kept))
            removed.append(len(lines) - len(kept))
        return pd.DataFrame({"clean": cleans, "removed": removed})

    res = df.withColumn("_bp", _clean(F.col(text_col)))
    return (res.withColumn(out_col, F.col("_bp.clean"))
               .withColumn("n_lines_removed", F.col("_bp.removed"))
               .drop("_bp"))
