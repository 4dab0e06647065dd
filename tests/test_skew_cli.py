"""Skew utilities + the spark-submit CLI driven end-to-end (incl. resume)."""

import json
import subprocess
import sys

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F

from outliertree_spark.operators.skew import hot_keys, salted_join


def test_salted_join_equivalence(spark):
    rng = np.random.RandomState(0)
    n = 20000
    # zipf-skewed key: one key holds ~50% of rows
    keys = np.where(rng.rand(n) < 0.5, 0, rng.randint(1, 50, n))
    big = spark.createDataFrame(
        pd.DataFrame({"host": keys, "v": rng.normal(size=n)}))
    small = spark.createDataFrame(
        pd.DataFrame({"host": np.arange(50), "w": np.arange(50) * 1.0}))
    plain = big.join(small, "host").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 6).alias("s")
    ).first()
    salted = salted_join(big, small, "host", n_salts=8).agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("v") * F.col("w")), 6).alias("s")
    ).first()
    assert plain["n"] == salted["n"]
    assert plain["s"] == pytest.approx(salted["s"], abs=1e-5)


def test_hot_keys(spark):
    rng = np.random.RandomState(1)
    n = 10000
    keys = np.where(rng.rand(n) < 0.3, "hot", rng.randint(0, 1000, n).astype(str))
    df = spark.createDataFrame(pd.DataFrame({"k": keys}))
    hot = hot_keys(df, "k", threshold_frac=0.05).toPandas()
    assert list(hot["k"]) == ["hot"]


def test_cli_run_and_resume(spark, tmp_path):
    # isolate: the CLI creates its own SparkSession in a subprocess
    src = str(tmp_path / "docs.parquet")
    rng = np.random.RandomState(42)
    n = 3000
    pdf = pd.DataFrame({
        "doc_id": np.arange(n),
        "text_len": rng.lognormal(5, 0.3, n),
        "lang": np.array(["en", "de", "fr"])[rng.randint(0, 3, n)],
        "bucket": np.arange(n) % 4,
    })
    pdf.loc[9, "text_len"] = 1e7
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    ledger = str(tmp_path / "ledger.jsonl")
    vout = str(tmp_path / "violations.parquet")
    model = str(tmp_path / "model.json")
    cmd = [sys.executable, "scripts/run_validate.py",
           "--input", src, "--partition-col", "bucket",
           "--id-col", "doc_id", "--checkpoint", ledger,
           "--violations-out", vout, "--model-out", model,
           "--master", "local[2]"]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=420,
                       cwd=".")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["status"] == "ok"

    viols = spark.read.parquet(vout).toPandas()
    assert 9 in set(viols["doc_id"])
    # resume: everything done -> nothing-to-do
    r2 = subprocess.run(cmd + ["--resume", "--model-in", model],
                        capture_output=True, text=True, timeout=420, cwd=".")
    assert r2.returncode == 0, r2.stderr[-2000:]
    out2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert out2["status"] == "nothing-to-do" and out2["done"] == 4


def test_domain_profile_ppm_and_hot_flag(spark):
    from outliertree_spark.operators.skew import domain_profile
    pdf = pd.DataFrame({"domain": ["a.com"] * 60 + ["b.com"] * 39
                        + ["c.com"]})
    prof = {r.domain: r for r in
            domain_profile(spark.createDataFrame(pdf), "domain").collect()}
    assert prof["a.com"].n_docs == 60 and prof["a.com"].ppm == 600000
    assert prof["b.com"].ppm == 390000
    assert prof["c.com"].ppm == 10000  # exactly at threshold: not hot
    assert prof["a.com"].is_hot and prof["b.com"].is_hot
    assert not prof["c.com"].is_hot
