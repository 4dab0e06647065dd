"""predict_at_scale: pure-Catalyst violations (score + broadcast cluster
dimension + JVM-side template substitution) must match the Arrow path."""

import json

import numpy as np
import pandas as pd

from pyspark.sql import functions as F


def _planted_df(spark):
    rng = np.random.RandomState(11)
    n = 3000
    grp = rng.choice(["a", "b"], n)
    y = np.where(grp == "b", rng.normal(100.0, 5.0, n),
                 rng.normal(0.0, 1.0, n))
    b_rows = np.flatnonzero(grp == "b")
    y[b_rows[0]] = 400.0
    color = np.where(rng.rand(n) < 0.995, np.where(grp == "b", "red", "blue"),
                     "green")
    pdf = pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                        "grp": grp, "y": y, "color": color})
    return spark.createDataFrame(pdf), int(b_rows[0])


def test_predict_at_scale_matches_predict(spark):
    from outliertree_spark import SparkOutlierTree, ValidationConfig

    df, planted = _planted_df(spark)
    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(df, id_cols=["rid"])

    rich = eng.predict(df, id_cols=["rid"]).toPandas() \
              .sort_values("rid").reset_index(drop=True)
    fast = eng.predict_at_scale(df, id_cols=["rid"]).toPandas() \
              .sort_values("rid").reset_index(drop=True)

    assert list(rich.columns) == list(fast.columns)
    assert list(rich["rid"]) == list(fast["rid"])
    assert planted in set(fast["rid"])
    for col in ("suspicious_column", "tree_depth", "uses_NA_branch"):
        assert list(rich[col]) == list(fast[col]), col
    assert np.allclose(rich["outlier_score"], fast["outlier_score"])
    # same conditions payload
    for a, b in zip(rich["conditions"], fast["conditions"]):
        assert json.loads(a) == json.loads(b)
    # group statistics agree numerically (fast embeds the same numbers)
    for a, b in zip(rich["group_statistics"], fast["group_statistics"]):
        da, db = json.loads(a), json.loads(b)
        assert set(da) == set(db), (da, db)
        for k in da:
            if isinstance(da[k], float):
                assert abs(da[k] - float(db[k])) < 1e-9, (k, da, db)
            else:
                assert str(da[k]) == str(db[k]), (k, da, db)
    # explanations byte-equal when dynamic decimals == min_decimals
    mism = [i for i in range(len(rich))
            if rich.loc[i, "explanation"] != fast.loc[i, "explanation"]]
    assert not mism, (rich.loc[mism[0], "explanation"],
                      fast.loc[mism[0], "explanation"]) if mism else None


def test_predict_at_scale_plan_is_python_free(spark):
    from outliertree_spark import SparkOutlierTree, ValidationConfig

    df, _ = _planted_df(spark)
    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(df, id_cols=["rid"])
    fast = eng.predict_at_scale(df, id_cols=["rid"])
    plan = fast._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEval", "BatchEval", "mapInPandas", "PythonUDF"):
        assert marker not in plan, marker
    # and the dimension join is a broadcast, not a shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_stream_violations_at_scale_python_free(spark, tmp_path):
    """The at-scale violations path runs on a streaming DataFrame with no
    Python operator in the micro-batch plan (stream-static broadcast
    join + codegen), and flags the same planted row."""
    from outliertree_spark import SparkOutlierTree, ValidationConfig
    from outliertree_spark.streaming.validate import (
        run_stream_to_memory, stream_violations_at_scale)

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(ev, id_cols=["event_id"], cols_ignore=["props"])
    bad = ev.withColumn("value", F.when(F.col("event_id") == 5, 8.8e8)
                        .otherwise(F.col("value")))
    src = str(tmp_path / "scale_stream_src")
    bad.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(bad.schema).parquet(src)
    v = stream_violations_at_scale(eng, stream, id_cols=["event_id"])
    plan = v._jdf.queryExecution().analyzed().toString()
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
    run_stream_to_memory(v, "viol_stream_scale")
    got = spark.sql("SELECT * FROM viol_stream_scale").toPandas()
    assert 5 in set(got["event_id"])
    assert got[got.event_id == 5].iloc[0]["suspicious_column"] == "value"
    assert "880000000" in got[got.event_id == 5].iloc[0]["explanation"]


def test_predict_at_scale_timestamp_target(spark):
    """Timestamp targets: encoded-value side selection + UTC display
    format agree with the Arrow path."""
    import datetime as dt
    from outliertree_spark import SparkOutlierTree, ValidationConfig

    rng = np.random.RandomState(9)
    n = 2000
    base = dt.datetime(2024, 1, 1)
    ts = [base + dt.timedelta(seconds=int(s))
          for s in rng.randint(0, 7 * 24 * 3600, n)]
    ts[3] = base + dt.timedelta(days=900)      # far future
    ts[4] = base - dt.timedelta(days=900)      # far past
    pdf = pd.DataFrame({"rid": np.arange(n, dtype=np.int64),
                        "warc_ts": ts, "x": rng.normal(size=n)})
    df = spark.createDataFrame(pdf)
    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(df, id_cols=["rid"])
    rich = eng.predict(df, id_cols=["rid"]).toPandas() \
              .sort_values("rid").reset_index(drop=True)
    fast = eng.predict_at_scale(df, id_cols=["rid"]).toPandas() \
              .sort_values("rid").reset_index(drop=True)
    assert {3, 4} <= set(fast["rid"])
    assert list(rich["rid"]) == list(fast["rid"])
    assert np.allclose(rich["outlier_score"], fast["outlier_score"])
    assert np.allclose(rich["suspicious_value_num"], fast["suspicious_value_num"])
    assert list(rich["explanation"]) == list(fast["explanation"])


def test_suite_at_scale_python_free(spark):
    from outliertree_spark import ValidationConfig
    from outliertree_spark.suite import ValidationSuite

    df, planted = _planted_df(spark)
    df = df.withColumn("part", F.col("rid") % 4)
    suite = (ValidationSuite(ValidationConfig())
             .add_uniqueness("rid"))
    suite.fit(df, id_cols=["rid"])
    viols, verdicts = suite.run(df, partition_col="part", id_cols=["rid"],
                                at_scale=True)
    plan = viols._jdf.queryExecution().executedPlan().toString()
    for marker in ("ArrowEval", "BatchEval", "MapInPandas", "PythonUDF"):
        assert marker not in plan, marker
    got = viols.toPandas()
    assert planted in set(got[got.check == "derived"]["rid"])
    assert verdicts.count() == 4
