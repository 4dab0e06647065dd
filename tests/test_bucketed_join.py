"""Co-located (bucketed) joins: the write-once-shuffle-never layout."""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from outliertree_spark.sources.bucketed import (cobucketed_join,
                                                read_table,
                                                write_bucketed)


@pytest.fixture()
def bucketed_tables(spark):
    rng = np.random.RandomState(7)
    n = 5000
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n),
        "text_len": rng.randint(10, 500, n)}))
    meta = spark.createDataFrame(pd.DataFrame({
        "doc_id": np.arange(n),
        "lang": np.array(["en", "de", "fr"])[np.arange(n) % 3]}))
    write_bucketed(docs, "t_docs_b", ["doc_id"], 8, sort_cols=["doc_id"])
    write_bucketed(meta, "t_meta_b", ["doc_id"], 8, sort_cols=["doc_id"])
    yield n
    spark.sql("DROP TABLE IF EXISTS t_docs_b")
    spark.sql("DROP TABLE IF EXISTS t_meta_b")


def test_cobucketed_join_has_no_exchange(spark, bucketed_tables):
    n = bucketed_tables
    # the fixture tables are tiny enough to auto-broadcast, which makes
    # the planner skip bucketed scans entirely; the real use case is two
    # big tables over the threshold — model that by disabling broadcast
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = cobucketed_join(spark, "t_docs_b", "t_meta_b", "doc_id")
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    # the whole point: both sides scan pre-bucketed files, so the
    # sort-merge join needs no shuffle at all
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    assert j.count() == n
    # and the result is the plain join's result
    got = j.groupBy("lang").count().orderBy("lang").collect()
    assert [(r["lang"], r["count"]) for r in got] == [
        ("de", 1667), ("en", 1667), ("fr", 1666)]


def test_path_read_loses_bucketing_catalog_read_keeps_it(spark,
                                                         bucketed_tables):
    """The bucket spec lives in the catalog: spark.table() joins without
    an exchange, while reading the same parquet files by path shuffles
    — the test pins WHY read_table exists."""
    loc = (spark.sql("DESCRIBE FORMATTED t_docs_b").where(
        F.col("col_name") == "Location").collect()[0]["data_type"])
    by_path = spark.read.parquet(loc.replace("file:", ""))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j2 = by_path.join(read_table(spark, "t_meta_b"), "doc_id")
        plan2 = j2._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange hashpartitioning" in plan2


def test_snapshot_diff_on_bucketed_tables_has_no_exchange(spark):
    """Backs the snapshot_diff docstring claim: on co-bucketed snapshot
    versions the digest full-outer join runs with NO Exchange."""
    import numpy as np
    import pandas as pd
    from outliertree_spark.operators.checks import snapshot_diff
    n = 3000
    old = pd.DataFrame({"doc_id": np.arange(n),
                        "text": [f"t{i}" for i in range(n)]})
    new = old.copy()
    new.loc[7, "text"] = "CHANGED"
    new = new[new["doc_id"] != 9]
    write_bucketed(spark.createDataFrame(old), "t_snap_old",
                   ["doc_id"], 8, sort_cols=["doc_id"])
    write_bucketed(spark.createDataFrame(new), "t_snap_new",
                   ["doc_id"], 8, sort_cols=["doc_id"])
    try:
        d = snapshot_diff(read_table(spark, "t_snap_old"),
                          read_table(spark, "t_snap_new"), "doc_id")
        plan = d._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        got = {r["doc_id"]: r["change_type"] for r in d.collect()}
        assert got == {7: "changed", 9: "removed"}
    finally:
        spark.sql("DROP TABLE IF EXISTS t_snap_old")
        spark.sql("DROP TABLE IF EXISTS t_snap_new")
