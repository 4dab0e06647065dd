"""Bucketed-table layout for exchange-free (co-located) joins.

At 100 TB the dominant cost of a repeated big-big join (e.g. violations
x document metadata, or crawl-snapshot diffs keyed on url hash) is the
shuffle.  Writing both sides bucketed on the join key with the same
bucket count lets Spark's bucketed-scan rule line the partitions up at
read time: the sort-merge join runs with NO Exchange on either side —
the shuffle is paid once at write time and amortized over every
subsequent join (tests/test_bucketed_join.py asserts the exchange-free
plan).

Cluster note: bucketing metadata lives in the session catalog
(``saveAsTable``); on a real deployment that is the shared metastore /
Iceberg catalog, so every job sees the same bucketing and the planner
can rely on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   n_buckets: int, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Persist ``df`` as a parquet table bucketed (and optionally sorted)
    on ``bucket_cols`` — the one-time shuffle that later joins skip.
    Sorting within buckets additionally removes the per-join Sort for
    sort-merge joins on the same key."""
    w = (df.write.mode(mode).format("parquet")
           .bucketBy(n_buckets, *bucket_cols))
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Catalog read that preserves the bucketing spec (a path-based
    ``spark.read.parquet`` would NOT — the bucket metadata lives in the
    catalog entry, and without it every join shuffles again)."""
    return spark.table(table)


def cobucketed_join(spark: SparkSession, left_table: str,
                    right_table: str, on: list[str] | str,
                    how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key.  With
    matching bucket counts the physical plan contains no Exchange; with
    matching sortBy it needs no per-join Sort either."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), on=on, how=how)
