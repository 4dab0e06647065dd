"""Bloom membership screen: no-false-negative guarantee, fpp bound,
exactness of the screen+verify composition, NULL-key handling."""
import pytest

from pyspark.sql import functions as F


def _keys_df(spark, vals):
    return spark.createDataFrame([(v,) for v in vals], "k string")


def test_no_false_negatives_and_fpp(spark):
    from outliertree_spark.operators.bloom import build_bloom, might_contain
    members = [f"key-{i}" for i in range(500)]
    bloom = build_bloom(_keys_df(spark, members), "k", fpp=0.01)
    probe = _keys_df(spark, members + [f"other-{i}" for i in range(2000)])
    got = probe.withColumn("hit", might_contain(bloom, F.col("k"))) \
               .collect()
    hits = {r["k"] for r in got if r["hit"]}
    assert set(members) <= hits, "bloom false negative"
    fp = len(hits - set(members))
    # 2000 non-members at fpp=0.01 -> ~20 expected; 5x headroom
    assert fp <= 100, f"false-positive rate blown: {fp}/2000"


def test_screen_equals_exact_semi_join(spark):
    from outliertree_spark.operators.bloom import bloom_screen
    df = spark.range(0, 3000).select(
        F.col("id"), F.concat(F.lit("u-"), (F.col("id") % 700))
         .alias("url"))
    keys = spark.range(0, 700, 3).select(
        F.concat(F.lit("u-"), F.col("id")).alias("member_url"))
    got = bloom_screen(df, keys, F.col("url"), "member_url", fpp=0.05)
    exact = df.join(keys.select(F.col("member_url").alias("url"))
                    .distinct(), "url", "left_semi")
    assert sorted(r["id"] for r in got.collect()) == \
        sorted(r["id"] for r in exact.collect())
    assert got.columns == df.columns


def test_null_keys_never_match(spark):
    from outliertree_spark.operators.bloom import build_bloom, might_contain
    bloom = build_bloom(_keys_df(spark, ["a", "b"]), "k")
    probe = spark.createDataFrame([("a",), (None,)], "k string")
    rows = {r["k"]: r["hit"] for r in probe.withColumn(
        "hit", might_contain(bloom, F.col("k"))).collect()}
    assert rows["a"] is True
    assert rows[None] is False


def test_params_monotone():
    from outliertree_spark.operators.bloom import bloom_params
    m1, k1 = bloom_params(1000, 0.01)
    m2, _ = bloom_params(1000, 0.001)
    m3, _ = bloom_params(10000, 0.01)
    assert m2 > m1 and m3 > m1
    assert m1 % 64 == 0 and k1 >= 1
    # sizing sanity: ~9.6 bits/key at 1% fpp
    assert 9 * 1000 <= m1 <= 11 * 1000
