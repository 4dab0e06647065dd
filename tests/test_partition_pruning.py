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
