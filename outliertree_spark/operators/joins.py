"""Temporal join operators Spark lacks as built-ins.

- ``as_of_join``: for every left row, the most recent right row of the
  same key at-or-before its timestamp (backward as-of).  Implemented the
  scalable way: tag + UNION both sides, ONE shuffle on the key, and a
  running ``last(..., ignorenulls)`` window — never a per-row range
  probe, never a broadcast of the big side.  At 100 TB this is one
  exchange of each input keyed by the join key, with map-side projection
  of only the carried columns.
- ``time_window_pairs``: keyed band join (pairs of rows of the same key
  within a time window) as an equi-join on the key plus a range
  predicate — Spark executes it as a sort-merge join with the range as a
  join condition; AQE skew handling applies on hot keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def as_of_join(left: DataFrame, right: DataFrame, on: str,
               left_ts: str, right_ts: str,
               right_cols: list[str] | None = None,
               suffix: str = "_right") -> DataFrame:
    """Backward as-of join: left rows get the latest right row with
    ``right_ts <= left_ts`` for the same ``on`` key (NULLs when no such
    row).  Equal timestamps count as 'before' (inclusive), matching
    DuckDB/pandas ASOF semantics."""
    right_cols = right_cols or [c for c in right.columns
                                if c not in (on, right_ts)]
    payload = F.struct(F.col(right_ts).alias("_ts"),
                       *[F.col(c) for c in right_cols])
    r = right.select(F.col(on), F.col(right_ts).alias("_evt_ts"),
                     payload.alias("_rpay"),
                     F.lit(0).alias("_side"))
    lcols = [c for c in left.columns]
    l = left.select(*lcols, F.col(left_ts).alias("_evt_ts"),
                    F.lit(None).cast(r.schema["_rpay"].dataType).alias("_rpay"),
                    F.lit(1).alias("_side"))
    u = l.unionByName(r.select(on, "_evt_ts", "_rpay", "_side"),
                      allowMissingColumns=True)
    # right rows sort before left rows at equal timestamps -> inclusive
    w = (Window.partitionBy(on).orderBy("_evt_ts", "_side")
         .rowsBetween(Window.unboundedPreceding, 0))
    matched = F.last("_rpay", ignorenulls=True).over(w)
    out = (u.withColumn("_m", matched)
            .filter(F.col("_side") == 1)
            .drop("_evt_ts", "_rpay", "_side"))
    out = out.withColumn(f"{right_ts}{suffix}", F.col("_m._ts"))
    for c in right_cols:
        out = out.withColumn(f"{c}{suffix}" if c in lcols else c,
                             F.col(f"_m.{c}"))
    return out.drop("_m")


def time_window_pairs(df: DataFrame, key_col: str, ts_col: str,
                      window_seconds: int,
                      id_col: str | None = None) -> DataFrame:
    """Pairs of rows of the same key with 0 < ts_b - ts_a <= window:
    keyed band join.  Hot keys produce O(k^2) pairs by definition — cap
    upstream (e.g. similarity._cap_buckets on the key) if the key
    distribution is adversarial."""
    cols = [key_col, ts_col] + ([id_col] if id_col else [])
    a = df.select(*[F.col(c).alias(f"{c}_a") for c in cols])
    b = df.select(*[F.col(c).alias(f"{c}_b") for c in cols])
    cond = ((F.col(f"{key_col}_a") == F.col(f"{key_col}_b"))
            & (F.col(f"{ts_col}_b") > F.col(f"{ts_col}_a"))
            & (F.col(f"{ts_col}_b")
               <= F.col(f"{ts_col}_a") + F.expr(f"INTERVAL {window_seconds} SECONDS")))
    return a.join(b, cond)
