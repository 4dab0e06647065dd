"""Skew-handling join utilities (north-rule: hot web domains).

AQE's skew-join split handles sort-merge skew automatically
(spark.sql.adaptive.skewJoin.enabled is on in session.get_spark); this
module adds the explicit remedies for the cases AQE can't fix:
- ``salted_join``: replicate the small side N ways and scatter the big
  side's hot keys across N salts — bounds any single task's share of a
  hot key at 1/N.
- ``hot_keys``: cheap frequency probe to decide N (one pass, approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hot_keys(df: DataFrame, key: str, threshold_frac: float = 0.01,
             approx_rsd: float = 0.05) -> DataFrame:
    """Keys holding more than ``threshold_frac`` of all rows."""
    total = df.count()
    return (df.groupBy(key).agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > threshold_frac * total))


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

    One grouped pass over the corpus (map-side partial agg), then share
    arithmetic over the *grouped* result — the whole-partition window
    runs on one row per domain, never on the corpus.  Shares are exact
    integer parts-per-million (``n * 1e6 div total``) so the numbers are
    reproducible bit-for-bit across engines; ``is_hot`` marks domains
    holding more than ``hot_ppm``/1e6 of all rows (default 1%), the
    same threshold ``salted_join`` is sized against.  At 10^12 docs the
    grouped result is one row per registrable domain (~1e8 worst case);
    if even that outgrows a single window partition, swap the window for
    a scalar ``total`` computed in the same job via a grouping-sets agg.
    """
    from pyspark.sql import Window
    counts = df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("n_docs"))
    withtot = counts.withColumn(
        "_total", F.sum("n_docs").over(Window.partitionBy()))
    return (withtot
            .withColumn("ppm", F.expr("(n_docs * 1000000) div _total"))
            .withColumn("is_hot",
                        F.col("n_docs") * 1_000_000
                        > F.lit(int(hot_ppm)) * F.col("_total"))
            .drop("_total"))
