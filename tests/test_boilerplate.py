"""Boilerplate line detection + row-local removal."""

import pyspark.sql.functions as F

from outliertree_spark.operators.boilerplate import (
    collect_boilerplate,
    frequent_lines,
    remove_boilerplate,
)

DOCS = [
    (1, "real content about apples\ncookie banner accept all\nmore text one"),
    (2, "different content here\ncookie banner accept all\nshort"),
    (3, "cookie banner accept all\nnothing else interesting today"),
    (4, "totally unique document body\nno shared lines at all"),
    (5, "repeat me twice\nrepeat me twice\nactual body text here"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_frequent_lines(spark):
    got = {r.line: r.n_docs
           for r in frequent_lines(_df(spark), min_docs=3).collect()}
    assert got == {"cookie banner accept all": 3}
    # within-doc repeats count once (doc 5's duplicate line)
    two = {r.line: r.n_docs
           for r in frequent_lines(_df(spark), min_docs=2).collect()}
    assert two == {"cookie banner accept all": 3}


def test_remove_boilerplate_preserves_order(spark):
    df = _df(spark)
    boiler = collect_boilerplate(df, min_docs=3, max_lines=10)
    assert boiler == ["cookie banner accept all"]
    out = {r.doc_id: r for r in remove_boilerplate(df, boiler).collect()}
    assert out[1].clean_text == "real content about apples\nmore text one"
    assert out[1].n_lines_removed == 1
    assert out[3].clean_text == "nothing else interesting today"
    assert out[4].clean_text == DOCS[3][1]
    assert out[4].n_lines_removed == 0
    # non-boiler within-doc repeats survive, both copies
    assert out[5].clean_text == DOCS[4][1]


def test_remove_boilerplate_empty_set(spark):
    df = _df(spark)
    out = remove_boilerplate(df, [])
    assert out.filter(F.col("n_lines_removed") != 0).count() == 0
    assert out.filter(F.col("clean_text") != F.col("text")).count() == 0


def test_removal_plan_has_no_shuffle(spark):
    df = _df(spark)
    plan = (remove_boilerplate(df, ["cookie banner accept all"])
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_set_method_matches_literal(spark):
    """The Arrow set-membership path (large boiler sets) must produce
    byte-identical output to the Catalyst literal path, including
    trim-at-match-but-not-in-output, preserved order, and nulls."""
    docs = DOCS + [
        (6, "  cookie banner accept all  \nleading spaces kept\tok"),
        (7, None),
        (8, ""),
        (9, "cookie banner accept all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    boiler = ["cookie banner accept all", "never seen line"]
    lit = {r.doc_id: (r.clean_text, r.n_lines_removed)
           for r in remove_boilerplate(df, boiler,
                                       method="literal").collect()}
    st = {r.doc_id: (r.clean_text, r.n_lines_removed)
          for r in remove_boilerplate(df, boiler, method="set").collect()}
    assert lit == st
    # the padded copy matches after trim, so it is removed too
    assert lit[6] == ("leading spaces kept\tok", 1)
    assert lit[7] == (None, None)
    assert lit[9] == ("", 1)


def test_auto_method_picks_by_set_size(spark):
    from outliertree_spark.operators.boilerplate import LITERAL_SET_MAX
    df = _df(spark)
    small = ["cookie banner accept all"]
    big = [f"boiler line number {i}" for i in range(LITERAL_SET_MAX + 1)]
    plan_small = (remove_boilerplate(df, small)
                  ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan_small
    plan_big = (remove_boilerplate(df, big)
                ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" in plan_big
