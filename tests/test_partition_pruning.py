"""Scale evidence: the fitted timestamp bounds prune whole partitions of a
date-partitioned table (the Iceberg/hive layout of the north rule)."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from outliertree_spark import SparkOutlierTree, ValidationConfig


def test_partition_prune_expr_skips_clean_partitions(spark, tmp_path):
    rng = np.random.RandomState(42)
    n = 6000
    base = pd.Timestamp("2024-01-01")
    ts = base + pd.to_timedelta(rng.randint(0, 10 * 24 * 3600, size=n), unit="s")
    ts = pd.Series(ts)
    # two planted rows far outside the 10-day window
    ts.iloc[5] = base + pd.Timedelta(days=400)
    ts.iloc[6] = base - pd.Timedelta(days=400)
    pdf = pd.DataFrame({"id": np.arange(n), "warc_ts": ts,
                        "x": rng.normal(size=n)})
    df = (spark.createDataFrame(pdf)
          .withColumn("dt", F.to_date("warc_ts")))
    path = str(tmp_path / "parted")
    df.write.partitionBy("dt").mode("overwrite").parquet(path)
    parted = spark.read.parquet(path)

    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(parted.drop("dt"), id_cols=["id"])
    prune = eng.partition_prune_expr("warc_ts", "dt")
    assert prune is not None

    pruned = parted.filter(prune)
    # the predicate lands as a PartitionFilter on the scan node
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [((dt" in plan or "PartitionFilters: [(dt" in plan
    # only the two out-of-window partitions survive
    assert pruned.select("dt").distinct().count() == 2
    assert pruned.count() == 2
    # and the planted rows are still reachable through the pruned scan
    viols = eng.predict(pruned, id_cols=["id"]).toPandas()
    assert {5, 6} <= set(viols["id"])


def test_validation_layout_prunes_text_from_scan(spark, tmp_path):
    """The stored-feature layout: validation reads must not decode the
    text bytes (ReadSchema excludes text), and the stored text_len
    equals the derived one."""
    import pandas as pd
    from pyspark.sql import functions as F
    from outliertree_spark.sources.docs import (read_validation_layout,
                                                write_validation_layout)

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": range(100),
        "text": [f"text number {i} " + "x" * (i % 17) for i in range(100)],
        "lang": ["en"] * 100}))
    path = str(tmp_path / "val_layout.parquet")
    write_validation_layout(docs, path, n_files=4)

    feat = read_validation_layout(spark, path)
    assert "text" not in feat.columns and "text_len" in feat.columns
    plan = feat._jdf.queryExecution().executedPlan().toString()
    scan_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "text_len" in scan_line
    assert "text:string" not in scan_line  # the bytes stay on disk

    # stored feature equals the derived one
    derived = docs.select("doc_id",
                          F.length("text").cast("double").alias("d"))
    j = feat.join(derived, "doc_id")
    assert j.filter(F.col("text_len") != F.col("d")).count() == 0
