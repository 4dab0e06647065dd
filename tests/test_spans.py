"""Duplicate-span (ExactSubstr-style) dedup: keep-first window dedup and
row-local covered-token removal (operators/spans.py)."""

import pytest

from pyspark.sql import functions as F

from outliertree_spark.operators.spans import (duplicate_spans,
                                               remove_duplicate_spans,
                                               span_occurrences)


@pytest.fixture(scope="module")
def docs(spark):
    shared = "the quick brown fox jumps over the lazy dog tonight"  # 10 toks
    rows = [
        (0, f"intro words here {shared} closing remarks now"),
        (1, f"other document starts {shared} and then diverges completely"),
        (2, "a totally unrelated short document"),
        (3, "tiny"),
        (4, f"Self repeat {shared} middle part {shared} tail bit"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_span_occurrences_positions(spark, docs):
    occ = span_occurrences(docs.filter("doc_id = 2"), span_tokens=3,
                           key_kind="md5").collect()
    # 5 tokens -> 3 windows at positions 0..2
    assert sorted(r["pos"] for r in occ) == [0, 1, 2]


def test_duplicate_spans_keep_first(spark, docs):
    losers = duplicate_spans(docs, span_tokens=8, key_kind="md5").toPandas()
    # doc 0 holds the globally-first occurrence of every shared window
    assert 0 not in set(losers["doc_id"])
    assert {1, 4} <= set(losers["doc_id"])
    # docs 2 and 3 share no 8-token span with anything
    assert not {2, 3} & set(losers["doc_id"])
    assert (losers["n_sites"] >= 2).all()


def test_remove_duplicate_spans_semantics(spark, docs):
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(docs, span_tokens=8,
                                  key_kind="md5").collect()}
    # untouched docs keep their exact original text, zero removed
    assert out[2]["text_dedup"] == "a totally unrelated short document"
    assert out[2]["n_tokens_removed"] == 0
    assert out[3]["text_dedup"] == "tiny"
    # doc 0 is the global keeper: nothing removed there either
    assert out[0]["n_tokens_removed"] == 0
    assert "quick brown fox" in out[0]["text_dedup"]
    # doc 1 loses the shared run but keeps its own framing words
    assert out[1]["n_tokens_removed"] >= 10
    assert "other document starts" in out[1]["text_dedup"]
    assert "diverges completely" in out[1]["text_dedup"]
    assert "quick brown fox" not in out[1]["text_dedup"]
    # doc 4 loses BOTH of its copies (doc 0 owns the keeper)
    assert "quick brown fox" not in out[4]["text_dedup"]
    assert "Self repeat" in out[4]["text_dedup"]  # case preserved
    # global survival: every removed span still exists somewhere
    assert "quick brown fox" in out[0]["text_dedup"]


def test_remove_duplicate_spans_case_insensitive_identity(spark):
    df = spark.createDataFrame(
        [(0, "Alpha Beta Gamma Delta Epsilon Zeta Eta Theta trailer"),
         (1, "prefix alpha beta gamma delta epsilon zeta eta theta")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           remove_duplicate_spans(df, span_tokens=8,
                                  key_kind="md5").collect()}
    # identity matched despite the case difference; keeper (doc 0)
    # preserves its original casing
    assert out[0]["n_tokens_removed"] == 0
    assert out[0]["text_dedup"].startswith("Alpha Beta")
    assert out[1]["n_tokens_removed"] == 8
    assert out[1]["text_dedup"] == "prefix"


def test_xx_and_md5_flavors_agree(spark, docs):
    a = {(r["doc_id"], r["n_tokens_removed"]) for r in
         remove_duplicate_spans(docs, span_tokens=8,
                                key_kind="md5").collect()}
    b = {(r["doc_id"], r["n_tokens_removed"]) for r in
         remove_duplicate_spans(docs, span_tokens=8,
                                key_kind="xx").collect()}
    assert a == b


def test_detection_exchange_is_text_free(spark, docs):
    """The global span-dedup exchange must carry (key, doc_id, pos)
    only — never the text column (the paragraph-dedup discipline)."""
    plan = (duplicate_spans(docs, span_tokens=8, key_kind="md5")
            ._jdf.queryExecution().executedPlan().toString())
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "text#" not in line, line
