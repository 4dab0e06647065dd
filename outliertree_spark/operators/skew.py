"""Skew-handling join utilities (north-rule: hot web domains).

AQE's skew-join split handles sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled is on in session.get_spark); this
module adds the explicit remedies for the cases AQE can't fix:
- ``salted_join``: replicate the small side N ways and scatter the big
  side's hot keys across N salts — bounds any single task's share of a
  hot key at 1/N.
- ``hot_keys``: frequency probe to decide N (declarative, one grouped
  pass; no driver-side actions during construction).
- ``domain_profile`` -> ``auto_salted_join``: profile-driven sizing, the
  end-to-end shape the north rule asks for (hot-domain skew handled
  with explicit salting).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str,
             threshold_frac: float = 0.01) -> DataFrame:
    """Keys holding more than ``threshold_frac`` of all rows.

    Fully declarative: the total is a scalar aggregate broadcast-joined
    against the grouped counts (never a ``count()`` action during plan
    construction, never an unpartitioned window)."""
    counts = df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .filter(F.col("n") > threshold_frac * F.col("_total"))
            .drop("_total"))


def salted_join(big: DataFrame, small: DataFrame, key: str,
                n_salts: int = 16, how: str = "inner") -> DataFrame:
    """Join a skewed big side with a small side, scattering hot keys.

    The big side gets a deterministic per-row salt; the small side is
    exploded into ``n_salts`` replicas so every (key, salt) bucket finds
    its match.  Equivalent rows to a plain join, but no reducer receives
    more than ~1/n_salts of any hot key."""
    salt_big = (F.abs(F.xxhash64(*[F.col(c) for c in big.columns])) % n_salts)
    b = big.withColumn("_salt", salt_big)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    out = b.join(s, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def domain_profile(df: DataFrame, domain_col: str,
                   hot_ppm: int = 10_000) -> DataFrame:
    """Per-domain corpus share + hot flag, feeding the salting decision.

    One grouped pass over the corpus (map-side partial agg); the corpus
    total is a scalar aggregate over the *grouped* result, broadcast
    back with a cross join — no unpartitioned window, no SinglePartition
    exchange, so the plan holds even at ~1e8 registrable domains.
    Shares are exact integer parts-per-million (``n * 1e6 div total``)
    so the numbers are reproducible bit-for-bit across engines;
    ``is_hot`` marks domains holding more than ``hot_ppm``/1e6 of all
    rows (default 1%), the same threshold ``salted_join`` is sized
    against."""
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("_total"))
    return (counts.crossJoin(F.broadcast(total))
            .withColumn("ppm", F.expr("(n_docs * 1000000) div _total"))
            .withColumn("is_hot",
                        F.col("n_docs") * 1_000_000
                        > F.lit(int(hot_ppm)) * F.col("_total"))
            .drop("_total"))


def pick_n_salts(profile: DataFrame, target_frac: float = 0.01,
                 max_salts: int = 64) -> int:
    """Salting degree from a ``domain_profile`` result: enough salts
    that the hottest key's share per (key, salt) reducer drops to
    ``target_frac`` of the corpus.  n = ceil(max_ppm / 1e6 /
    target_frac), clamped to [1, max_salts].

    This is a driver-side *physical-plan decision* over the (tiny)
    grouped profile — one bounded action, analogous to AQE reading
    shuffle statistics to split skewed partitions; the corpus itself is
    never collected."""
    row = profile.agg(F.max("ppm").alias("m")).collect()[0]
    max_ppm = int(row["m"] or 0)
    n = math.ceil(max_ppm / 1e6 / target_frac)
    return max(1, min(int(n), max_salts))


def auto_salted_join(big: DataFrame, small: DataFrame, key: str,
                     how: str = "inner", target_frac: float = 0.01,
                     max_salts: int = 64) -> tuple[DataFrame, int]:
    """Profile-driven salted join: measure the big side's key skew with
    ``domain_profile``, size the salt count with ``pick_n_salts``, and
    run ``salted_join``.  Returns (result, n_salts); n_salts == 1 means
    the profile found no skew and the join runs unsalted."""
    prof = domain_profile(big.select(F.col(key)), key)
    n_salts = pick_n_salts(prof, target_frac, max_salts)
    if n_salts <= 1:
        return big.join(small, on=key, how=how), 1
    return salted_join(big, small, key, n_salts=n_salts, how=how), n_salts
