"""Streaming dedup (dropDuplicatesWithinWatermark) + quality gate."""

import datetime as dt

import pandas as pd

from outliertree_spark.streaming.validate import (run_stream_to_memory,
                                                  stream_exact_dedup,
                                                  stream_quality_gate)


def test_stream_exact_dedup_first_seen_wins(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "ts": [t0 + dt.timedelta(minutes=m) for m in range(5)],
        "text": ["alpha", "beta", "alpha", "gamma", "beta"],
    })
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, text string")
              .parquet(src))
    out = stream_exact_dedup(stream, "ts", watermark="10 minutes")
    run_stream_to_memory(out, "dedup_stream")
    got = spark.sql("SELECT * FROM dedup_stream").toPandas()
    # one survivor per distinct text; duplicates within the watermark
    # horizon suppressed; helper hash column dropped
    assert sorted(got["text"]) == ["alpha", "beta", "gamma"]
    assert set(got.columns) == {"doc_id", "ts", "text"}
    # Spark does not pin WHICH duplicate survives within a micro-batch
    # (partition order is nondeterministic) — assert each survivor is a
    # legitimate member of its duplicate group, not a specific one.
    groups = {"alpha": {1, 3}, "beta": {2, 5}, "gamma": {4}}
    for _, row in got.iterrows():
        assert row["doc_id"] in groups[row["text"]]


def test_stream_quality_gate_stateless(spark, tmp_path):
    pdf = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["the cat and the dog went to the market and it is fine "
                 * 4,
                 "!!!! ???? ,,,,"],
    })
    src = str(tmp_path / "quality_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    out = stream_quality_gate(stream, min_score=0.3)
    run_stream_to_memory(out, "quality_stream")
    got = spark.sql("SELECT doc_id FROM quality_stream").toPandas()
    assert list(got["doc_id"]) == [1]  # punctuation soup filtered


def test_stream_clean_pipeline_e2e(spark, tmp_path):
    """Streaming twin of the batch training pipeline: boilerplate lines
    removed, PII scrubbed, exact dups dropped within the watermark, all
    in one streaming plan."""
    import datetime as dt
    import pandas as pd
    from outliertree_spark.streaming.validate import (run_stream_to_memory,
                                                      stream_clean_pipeline)

    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    boiler_line = "cookie banner accept all rights"
    rows = [
        (1, t0, f"real content about apples\n{boiler_line}"),
        (2, t0, f"{boiler_line}\ncontact me user@example.com today"),
        (3, t0, f"real content about apples\n{boiler_line}"),  # dup of 1
        (4, t0, "totally unique document body here"),
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    src = str(tmp_path / "stream_clean")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = (spark.readStream
              .schema("doc_id long, ts timestamp, text string")
              .parquet(src))
    out = stream_clean_pipeline(stream, "ts", [boiler_line])
    run_stream_to_memory(out, "clean_pipe")
    got = spark.sql("SELECT * FROM clean_pipe").toPandas()
    # dup of doc 1/3 collapsed to ONE survivor (either id — the
    # within-batch survivor is not pinned); docs 2 and 4 survive
    assert len(got) == 3
    assert len({1, 3} & set(got.doc_id)) == 1
    by_id = got.set_index("doc_id")
    surv = ({1, 3} & set(got.doc_id)).pop()
    assert by_id.loc[surv, "clean_text"] == "real content about apples"
    assert "<EMAIL>" in by_id.loc[2, "_scrubbed"]
    assert boiler_line not in by_id.loc[2, "clean_text"]


def test_stream_gopher_gate_stateless(spark, tmp_path):
    from outliertree_spark.streaming.validate import stream_gopher_gate
    prose = ("the quick brown fox jumps over the lazy dog and then it "
             "decided that running was fine so it kept going across the "
             "wide field with many other animals joining in while birds "
             "watched from tall trees and the sun moved slowly over the "
             "distant hills until evening came and everything grew quiet")
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [prose, "too short", "#### " * 60 + prose],
    })
    src = str(tmp_path / "gopher_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema("doc_id long, text string")
              .parquet(src))
    kept = stream_gopher_gate(stream)
    run_stream_to_memory(kept, "gopher_stream")
    got = spark.sql("SELECT * FROM gopher_stream").toPandas()
    assert set(got["doc_id"]) == {1}          # short + symbol-spam dropped
    assert set(got.columns) == {"doc_id", "text"}
    # audit configuration: all rows pass through, annotated
    ann = stream_gopher_gate(stream, keep_only=False)
    run_stream_to_memory(ann, "gopher_audit_stream")
    aud = spark.sql("SELECT doc_id, gopher_keep, rule_word_count, "
                    "rule_symbol_ratio FROM gopher_audit_stream").toPandas()
    row = aud.set_index("doc_id")
    assert bool(row.loc[1, "gopher_keep"])
    assert not bool(row.loc[2, "rule_word_count"])
    assert not bool(row.loc[3, "rule_symbol_ratio"])


def test_stream_bloom_gate_stateless(spark, tmp_path):
    from outliertree_spark.operators.bloom import build_bloom
    from outliertree_spark.streaming.validate import stream_bloom_gate
    from pyspark.sql import functions as F
    pdf = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "url": ["http://ok.example/a", "http://bad.example/x",
                "http://ok.example/b", "http://bad.example/y"],
    })
    src = str(tmp_path / "bloom_src")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    blockset = spark.createDataFrame(
        [("http://bad.example/x",), ("http://bad.example/y",)],
        "blocked string")
    bloom = build_bloom(blockset, "blocked", fpp=0.001)
    stream = (spark.readStream.schema("doc_id long, url string")
              .parquet(src))
    kept = stream_bloom_gate(stream, bloom, F.col("url"))
    run_stream_to_memory(kept, "bloom_stream")
    got = spark.sql("SELECT * FROM bloom_stream").toPandas()
    # members ALWAYS probe true, so both blocked urls are gone for sure
    assert set(got["doc_id"]) <= {1, 3}
    members = stream_bloom_gate(stream, bloom, F.col("url"),
                                keep_members=True)
    run_stream_to_memory(members, "bloom_members_stream")
    mem = spark.sql("SELECT * FROM bloom_members_stream").toPandas()
    assert {2, 4} <= set(mem["doc_id"])
