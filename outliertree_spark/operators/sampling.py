"""Deterministic hash-based sampling for training-data pipelines.

At 100 TB, "sample 1%" must be (a) a single scan with a cheap row-local
predicate — no shuffle, no global sort, no RNG state — and (b) STABLE:
re-running the job, changing partitioning, or adding executors must
select the same rows, or downstream dedup/metrics silently drift.  Both
follow from hashing a key column instead of drawing randoms:

    keep  <=>  hash(key) mod M  <  rate * M

Two hash flavors, same semantics:

- ``xxhash64`` (scale default): 8-byte JVM-side hash, whole-stage
  codegen, fastest.
- ``md5_60`` (oracle flavor): 60 bits from the first 15 hex chars of
  md5, bit-for-bit reproducible in DuckDB/any SQL engine via
  ``CAST('0x' || substr(md5(key), 1, 15) AS BIGINT)`` — this is what
  makes the sampling operators SQL-oracleable.

Stratified sampling takes a per-stratum rate map (e.g. downsample
English, keep all low-resource languages) and compiles it to ONE
``CASE WHEN`` predicate — still a single scan, still shuffle-free; the
rate map is a plain literal, not a join (it is human-sized).

The reference has no sampling operator (it always fits in memory);
this is a north-rule/pipeline addition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_MOD = 1_000_000  # rate resolution 1e-6


def _hash_bucket(key: Column, salt: str, hash_kind: str) -> Column:
    """Uniform bucket in [0, _MOD) from a salted hash of ``key``."""
    if hash_kind == "md5_60":
        h = F.conv(F.substring(F.md5(F.concat(key.cast("string"),
                                              F.lit(salt))), 1, 15),
                   16, 10).cast("long")
        return F.pmod(h, F.lit(_MOD))
    if hash_kind != "xxhash64":
        # fail loud: a typo'd flavor silently falling through to
        # xxhash64 would select a row set the caller's oracle cannot
        # reproduce (same guard as packing._hash60)
        raise ValueError(f"unknown hash_kind {hash_kind!r}: "
                         f"expected 'md5_60' or 'xxhash64'")
    return F.pmod(F.xxhash64(key.cast("string"), F.lit(salt)), F.lit(_MOD))


def hash_sample(df: DataFrame, rate: float, key_col: str,
                salt: str = "s0", hash_kind: str = "xxhash64") -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows by hashed key.

    Rows with equal keys are kept or dropped together (hash of the key,
    not of the row) — the property dedup-aware pipelines want."""
    assert 0.0 <= rate <= 1.0
    b = _hash_bucket(F.col(key_col), salt, hash_kind)
    return df.filter(b < int(round(rate * _MOD)))


def stratified_sample(df: DataFrame, strata_col: str,
                      rates: dict[str, float], key_col: str,
                      default_rate: float = 0.0, salt: str = "s0",
                      hash_kind: str = "xxhash64") -> DataFrame:
    """Per-stratum deterministic sampling: one scan, one CASE WHEN
    threshold per stratum, no shuffle.  Strata missing from ``rates``
    get ``default_rate``."""
    b = _hash_bucket(F.col(key_col), salt, hash_kind)
    thr: Column = F.lit(int(round(default_rate * _MOD)))
    for stratum, rate in sorted(rates.items()):
        assert 0.0 <= rate <= 1.0
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(int(round(rate * _MOD)))).otherwise(thr)
    return df.filter(b < thr)


def split_train_holdout(df: DataFrame, holdout_rate: float, key_col: str,
                        salt: str = "split",
                        hash_kind: str = "xxhash64") -> DataFrame:
    """Add a deterministic ``split`` column ('train'/'holdout') keyed on
    ``key_col`` — equal keys land in the same split, so duplicates can
    never straddle the train/eval boundary (the contamination property
    LLM pipelines need).  Column, not filter: one scan serves both
    sides."""
    b = _hash_bucket(F.col(key_col), salt, hash_kind)
    return df.withColumn(
        "split",
        F.when(b < int(round(holdout_rate * _MOD)), F.lit("holdout"))
         .otherwise(F.lit("train")))


def mix_rates(df: DataFrame, group_col: str,
              shares: dict[str, float]) -> DataFrame:
    """Per-group acceptance rates that re-shape a corpus to a target
    group distribution (DoReMi/FineWeb-style domain mixing) WITHOUT
    upsampling: the output is the largest subset of the input whose
    group proportions equal ``shares``.

    With ``cnt_g`` the observed group counts, the achievable total is
    bounded by the scarcest group: ``scale = min_g(cnt_g / share_g)``,
    and each group keeps ``rate_g = share_g * scale / cnt_g`` (in
    (0, 1] by construction — the binding group keeps everything).
    Groups absent from ``shares`` get no row (explicit curation).
    A ``shares`` group ABSENT from the corpus participates with
    ``cnt = 0``: the scale is then 0 and every rate is 0, so the
    resample is EMPTY — the only subset whose proportions match a
    target that demands an unavailable group.  (A silent inner join
    here would instead drop the missing group and return a skewed
    mix; callers who want an error can check ``cnt > 0`` on the
    returned rates.)

    Fully declarative — no driver action: one column-pruned counting
    aggregate (map-side combined, exchange is #groups rows), a
    broadcast of the human-sized share map, and a broadcast scalar for
    the min.  Returns (group_col, cnt, share, mix_rate).

    All arithmetic is double ops over exact integer counts and literal
    shares in a fixed order — ``(share * scale) / cnt`` — so any SQL
    engine reproduces ``mix_rate`` bit-for-bit (the oracle property)."""
    assert shares and all(s > 0 for s in shares.values())
    spark = df.sparkSession
    from ..localrel import local_df
    tgt = local_df(spark, sorted(shares.items()),
                   f"{group_col} string, share double")
    observed = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("cnt"))
    # tgt-side outer: a requested group missing from the corpus must
    # surface as cnt=0 (scale 0, empty resample), not silently vanish
    counts = (tgt.join(F.broadcast(observed), group_col, "left")
                 .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long"))))
    scale = counts.agg(F.min(F.col("cnt").cast("double")
                             / F.col("share")).alias("_scale"))
    return (counts.crossJoin(F.broadcast(scale))
                  .select(group_col, "cnt", "share",
                          F.when(F.col("cnt") > 0,
                                 (F.col("share") * F.col("_scale"))
                                 / F.col("cnt").cast("double"))
                           .otherwise(F.lit(0.0)).alias("mix_rate")))


def resample_to_mix(df: DataFrame, group_col: str,
                    shares: dict[str, float], key_col: str,
                    salt: str = "mix",
                    hash_kind: str = "xxhash64") -> DataFrame:
    """Deterministically downsample ``df`` so the surviving rows'
    ``group_col`` distribution matches ``shares`` (the data-mixing
    primitive for training-corpus curation).

    Row-local keep predicate — ``hash(key) mod M < rate_g * M`` — so
    the corpus itself never shuffles; rates come from
    :func:`mix_rates` (tiny aggregate + broadcasts) and reach each row
    through a BroadcastHashJoin.  Two passes over the group column, one
    over the full rows; equal keys are kept or dropped together, same
    as every sampler here.  ``md5_60`` flavor is SQL-reproducible."""
    rates = mix_rates(df, group_col, shares)
    b = _hash_bucket(F.col(key_col), salt, hash_kind)
    return (df.join(F.broadcast(rates.select(group_col, "mix_rate")),
                    group_col)
              .filter(b.cast("double") < F.col("mix_rate") * F.lit(float(_MOD)))
              .drop("mix_rate"))


def mix_weights(df: DataFrame, group_col: str,
                shares: dict[str, float]) -> DataFrame:
    """Per-group LOSS WEIGHTS that re-shape a corpus to ``shares``
    without dropping rows — the DoReMi-style alternative to
    :func:`resample_to_mix` when data is scarce: every row is kept and
    examples are reweighted in the training loss instead.

    ``weight_g = (share_g / sum(shares)) / (cnt_g / total)`` — the
    ratio of the target share to the observed share over the REQUESTED
    groups.  When every requested group is present,
    ``sum_g(cnt_g * weight_g) == total`` (weights are mean-one over the
    covered corpus) and weighted group mass matches the normalized
    target exactly.  Groups absent from ``shares`` get no row (same
    explicit-curation convention as mix_rates); a requested group with
    NO rows keeps weight 0.0, and the weighted mass then deliberately
    falls short of ``total`` by that group's share — the deficit stays
    VISIBLE instead of being silently renormalized onto the present
    groups (callers who want rescaling can divide by
    ``sum(share where cnt > 0)``).

    Same fixed evaluation order discipline as mix_rates —
    ``(share / share_sum) * total / cnt`` over exact integer counts —
    so any SQL engine reproduces the doubles bit-for-bit.  One counting
    aggregate + broadcasts; returns (group_col, cnt, share, weight)."""
    assert shares and all(s > 0 for s in shares.values())
    spark = df.sparkSession
    share_sum = float(sum(shares.values()))
    from ..localrel import local_df
    tgt = local_df(spark, sorted(shares.items()),
                   f"{group_col} string, share double")
    observed = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("cnt"))
    counts = (tgt.join(F.broadcast(observed), group_col, "left")
                 .withColumn("cnt", F.coalesce("cnt", F.lit(0).cast("long"))))
    total = counts.agg(F.sum("cnt").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
                  .select(group_col, "cnt", "share",
                          F.when(F.col("cnt") > 0,
                                 (F.col("share") / F.lit(share_sum))
                                 * F.col("_total").cast("double")
                                 / F.col("cnt").cast("double"))
                           .otherwise(F.lit(0.0)).alias("weight")))


def weight_documents(df: DataFrame, group_col: str,
                     shares: dict[str, float],
                     weight_col: str = "sample_weight") -> DataFrame:
    """Attach the :func:`mix_weights` weight to every covered row via a
    BroadcastHashJoin (rows of groups outside ``shares`` are dropped,
    matching resample_to_mix's curation convention).  Row-local apart
    from the tiny counting aggregate — the corpus never shuffles."""
    w = mix_weights(df, group_col, shares)
    return df.join(F.broadcast(w.select(group_col,
                                        F.col("weight").alias(weight_col))),
                   group_col)
