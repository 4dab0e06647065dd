"""local_df (Arrow-backed local relations) must be a drop-in twin of
``spark.createDataFrame(rows, schema)`` for every schema form the engine
uses — same rows, same schema (names, types, nullability) — while
keeping Python out of the execution path (LocalTableScan, no
``applySchemaToPythonRDD`` pickle lane)."""

from pyspark.sql import types as T

from outliertree_spark.localrel import local_df


def _both(spark, rows, schema):
    a = local_df(spark, rows, schema)
    b = spark.createDataFrame(rows, schema)
    return a, b


def test_structtype_long_pairs(spark):
    sch = T.StructType([T.StructField("id", T.LongType(), False),
                        T.StructField("component", T.LongType(), False)])
    a, b = _both(spark, [(5, 1), (7, 1), (9, 9)], sch)
    assert a.schema == b.schema
    assert sorted(a.collect()) == sorted(b.collect())


def test_structtype_string_pairs(spark):
    sch = T.StructType([T.StructField("id", T.StringType(), False),
                        T.StructField("component", T.StringType(), False)])
    a, b = _both(spark, [("u1", "u0"), ("u0", "u0")], sch)
    assert a.schema == b.schema
    assert sorted(a.collect()) == sorted(b.collect())


def test_ddl_schema_and_infinities(spark):
    rows = [("a", 1, 0.5, ["x", "y"]), ("b", 2, float("-inf"), [])]
    sch = ("suspicious_column string, cluster_id int, "
           "lower_lim double, cond_cols array<string>")
    a, b = _both(spark, rows, sch)
    assert a.schema == b.schema
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_names_list_schema(spark):
    a, b = _both(spark, [("b1", 0.25), ("b2", 0.5)],
                 ["_psi_bucket", "miss_term"])
    assert a.schema == b.schema
    assert sorted(a.collect()) == sorted(b.collect())


def test_empty_rows_with_schema(spark):
    sch = T.StructType([T.StructField("id", T.LongType(), False)])
    a, b = _both(spark, [], sch)
    assert a.schema == b.schema
    assert a.count() == b.count() == 0


def test_execution_is_jvm_only(spark):
    """The whole point: the plan is a LocalTableScan with no Python
    evaluation node and no pickled-RDD scan."""
    a = local_df(spark, [(1, 2)], "x long, y long")
    plan = a._jdf.queryExecution().executedPlan().toString()
    assert "LocalTableScan" in plan, plan
    for node in ("BatchEvalPython", "ArrowEvalPython", "ExistingRDD"):
        assert node not in plan, plan
