"""Test-set decontamination: flag training documents that share n-grams
with a benchmark/evaluation corpus.

Shape at 100 TB: benchmark suites are tiny next to the corpus (MBs of
n-grams vs TBs of text), so the contaminated-gram probe is a BROADCAST
hash join — map-side, no shuffle of the corpus.  Document n-grams are
built row-locally (array ops inside codegen, same construction as
operators/text.py::winnowing_fingerprints); the explode is pipelined into
the broadcast join, and only matching grams — a vanishingly small set —
reach the final per-doc aggregation, so the one shuffle in the plan moves
almost nothing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def ngram_hashes(text_col: str = "text", n: int = 8,
                 token_hash: str = "xxhash64") -> Column:
    """Row-local array of hashed n-token grams of the lowercased text
    (distinct).  Flavors: ``xxhash64`` (8-byte grams keep the broadcast
    set small — the 100TB default when the benchmark suite is large),
    ``md5_60`` (first 15 md5 hex chars as a 60-bit int;
    DuckDB-reproducible), ``raw`` (the gram STRING itself: trivially
    DuckDB-reproducible, no hash cost; broadcast set ~6x larger).
    ``xx_chain`` (rolling ``xxhash64(acc, next_token_hash)`` combine —
    no gram STRING is ever built AND the IDs live in the full 2^64
    space, phantom-hit probability ~ |doc grams| x |bench grams| / 2^64
    ~ 2e-14 per doc, negligible even at the 10^12-doc target; THE SCALE
    DEFAULT for hashed grams).  ``arith`` (rolling modular combine of
    per-token hashes in a ~2^40 prime space — gram membership identical
    to ``raw`` absent collisions, but phantom-hit probability ~ 4e-7
    per doc means ~4e5 docs falsely dropped at 10^12 docs: BENCH/ORACLE
    USE ONLY, do not ship at scale).
    Measured at sf0.1: flavor sweep raw 5.0s / md5_60 5.7s / xxhash64
    8.2s (round 2 harness); on the bench query the ``arith`` swap reads
    1.9s where ``raw`` read 3.0s (round 3); ``xx_chain`` measures within
    noise of ``arith`` (round 4 — both are string-free rolling
    combines).  Docs shorter than n tokens yield an empty array."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    cnt = F.size(toks)
    if token_hash in ("arith", "xx_chain"):
        if token_hash == "arith":
            M = F.lit(1099511627689)  # prime just under 2^40
            ha = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), M))
            comb = lambda a, b: F.pmod(a * F.lit(1000003) + b, M)  # noqa: E731
        else:
            ha = F.transform(toks, lambda t: F.xxhash64(t))
            comb = lambda a, b: F.xxhash64(a, b)  # noqa: E731
        m = cnt - n + 1
        acc = F.slice(ha, 1, m)
        for j in range(1, n):
            acc = F.zip_with(acc, F.slice(ha, 1 + j, m), comb)
        return F.when(cnt >= n, F.array_distinct(acc)) \
                .otherwise(F.array().cast("array<long>"))
    idx = F.sequence(F.lit(0), cnt - n)
    if token_hash == "md5_60":
        def _h(i):
            g = F.concat_ws(" ", F.slice(toks, i + 1, n))
            return F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")
    elif token_hash == "raw":
        def _h(i):
            return F.concat_ws(" ", F.slice(toks, i + 1, n))
        return F.when(cnt >= n, F.array_distinct(F.transform(idx, _h))) \
                .otherwise(F.array().cast("array<string>"))
    else:
        def _h(i):
            return F.xxhash64(F.concat_ws(" ", F.slice(toks, i + 1, n)))
    return F.when(cnt >= n, F.array_distinct(F.transform(idx, _h))) \
            .otherwise(F.array().cast("array<long>"))


def benchmark_grams(benchmark: DataFrame, text_col: str = "text",
                    n: int = 8, token_hash: str = "xxhash64") -> DataFrame:
    """Distinct n-gram hashes of the benchmark corpus — the small
    broadcast side: (gram) with one row per distinct hash."""
    return (benchmark
            .select(F.explode(ngram_hashes(text_col, n, token_hash))
                     .alias("gram"))
            .distinct())


def contamination_scores(docs: DataFrame, benchmark: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         bench_text_col: str = "text", n: int = 8,
                         token_hash: str = "xxhash64") -> DataFrame:
    """(id, n_grams, n_contaminated, contaminated) for every document.

    Plan — ONE pass over the corpus: row-local gram arrays -> explode
    (n_grams riding along) -> broadcast LEFT join marking benchmark grams
    -> groupBy(id) with map-side partial aggregation, so the single
    exchange carries one small row per document, never the grams.  An
    earlier two-pass shape (separate hits subplan left-joined back onto a
    recomputed per-doc gram count) built every gram twice and ran ~2x
    slower at sf0.1 (14s -> 6s).

    Deliberately NOT localCheckpoint-ed (round-4 A/B: 1.13s -> 1.04s
    warm minima at sf0.1, ~8%): the explode on top does make the
    optimizer re-inline the gram expression into both ``size`` and the
    Generate, but the recompute is bounded (x2 of a linear zip_with
    chain), while a checkpoint would materialize ~640 B of gram array
    per document — petabytes of intermediate storage at 10^12 docs to
    save a bounded in-scan recompute.  Contrast
    ``text.winnowing_fingerprints``, where the checkpoint is
    load-bearing because the un-cut plan is O(P^2), not x2.
    """
    grams = (benchmark_grams(benchmark, bench_text_col, n, token_hash)
             .withColumn("_hit", F.lit(1)))
    ex = docs.select(
        F.col(id_col),
        ngram_hashes(text_col, n, token_hash).alias("_grams"))
    ex = ex.select(
        F.col(id_col),
        F.size("_grams").cast("long").alias("n_grams"),
        F.explode_outer("_grams").alias("gram"))
    return (ex.join(F.broadcast(grams), "gram", "left")
              .groupBy(id_col)
              .agg(F.first("n_grams").alias("n_grams"),
                   F.coalesce(F.sum("_hit"), F.lit(0)).cast("long")
                    .alias("n_contaminated"))
              .withColumn("n_grams",
                          F.when(F.col("n_grams") < 0, F.lit(0))
                           .otherwise(F.col("n_grams")))
              .withColumn("contaminated", F.col("n_contaminated") > 0))
