"""Iceberg source (jar-gated).

The north rule's production input is an Iceberg table partitioned by
warc_ts.  The Iceberg runtime jar is not in this image, so the reader is
gated: it works as soon as `spark.sql.catalog...` + the runtime jar are on
the classpath, and raises a clear error otherwise.  All downstream
operators only see a DataFrame, so nothing else changes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

ICEBERG_CONF_HINT = {
    "spark.sql.extensions":
        "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.warehouse": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.warehouse.type": "hadoop",
    # + spark.jars.packages=org.apache.iceberg:iceberg-spark-runtime-...
}


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg runtime is actually on the JVM classpath.

    Note: ``spark._jvm.org.apache...`` attribute access can NOT be used
    here — py4j resolves missing classes to a lazy JavaPackage without
    raising, so that check always "succeeds".  Class.forName is the real
    probe."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_table(spark: SparkSession, table: str,
               snapshot_id: int | None = None,
               as_of_timestamp_ms: int | None = None) -> DataFrame:
    """`spark.table` over an Iceberg catalog table, with time travel."""
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime jar not on the classpath; configure the session "
            f"with {ICEBERG_CONF_HINT} and the iceberg-spark-runtime package. "
            "Parquet directories work as the stand-in source meanwhile.")
    reader = spark.read.format("iceberg")
    if snapshot_id is not None:
        reader = reader.option("snapshot-id", str(snapshot_id))
    if as_of_timestamp_ms is not None:
        reader = reader.option("as-of-timestamp", str(as_of_timestamp_ms))
    return reader.load(table)
