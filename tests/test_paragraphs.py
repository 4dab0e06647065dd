"""Global keep-first paragraph dedup (CCNet-style) semantics."""

import pyspark.sql.functions as F

from outliertree_spark.operators.paragraphs import (
    dedup_paragraphs,
    paragraph_stats,
)

DOCS = [
    (1, "alpha beta gamma\nshared paragraph one\nunique tail of doc one"),
    (2, "shared paragraph one\ndelta epsilon\nshared paragraph two"),
    (3, "shared paragraph two\nshared paragraph one\nzeta body"),
    # internal repeat: only the first copy survives
    (4, "echo echo paragraph\necho echo paragraph\nfinal line four"),
    # whitespace-only paragraphs are structure, always kept
    (5, "top line five\n   \nbottom line five"),
    # doc made entirely of paragraphs first seen elsewhere -> empty
    (6, "shared paragraph one\nshared paragraph two"),
]


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_keep_first_semantics(spark):
    out = {r.doc_id: r for r in dedup_paragraphs(_df(spark)).collect()}
    # doc 1 holds the first occurrence of "shared paragraph one": intact
    assert out[1].clean_text == DOCS[0][1]
    assert out[1].n_paras_removed == 0
    # doc 2 loses the repeat of one, keeps first occurrence of two
    assert out[2].clean_text == "delta epsilon\nshared paragraph two"
    assert out[2].n_paras_removed == 1
    # doc 3 loses both shared paragraphs
    assert out[3].clean_text == "zeta body"
    assert out[3].n_paras_removed == 2


def test_internal_repeat_keeps_first_copy(spark):
    out = {r.doc_id: r for r in dedup_paragraphs(_df(spark)).collect()}
    assert out[4].clean_text == "echo echo paragraph\nfinal line four"
    assert out[4].n_paras_removed == 1


def test_whitespace_paragraphs_always_kept(spark):
    out = {r.doc_id: r for r in dedup_paragraphs(_df(spark)).collect()}
    assert out[5].clean_text == DOCS[4][1]
    assert out[5].n_paras_removed == 0


def test_fully_duplicated_doc_becomes_empty(spark):
    out = {r.doc_id: r for r in dedup_paragraphs(_df(spark)).collect()}
    assert out[6].clean_text == ""
    assert out[6].n_paras_removed == 2
    # every doc survives as a row even when emptied
    assert set(out) == {1, 2, 3, 4, 5, 6}


def test_trimmed_identity(spark):
    df = spark.createDataFrame(
        [(1, "  padded para  \nbody one"), (2, "padded para\nbody two")],
        "doc_id long, text string")
    out = {r.doc_id: r for r in dedup_paragraphs(df).collect()}
    # identity is the space-trimmed paragraph; survivor keeps raw bytes
    assert out[1].clean_text == "  padded para  \nbody one"
    assert out[2].clean_text == "body two"


def test_exactly_one_copy_of_every_paragraph_survives(spark):
    """The dedup invariant: over the whole output corpus, each distinct
    non-empty trimmed paragraph appears exactly once."""
    out = dedup_paragraphs(_df(spark))
    paras = (out.select(F.explode(F.split("clean_text", "\n")).alias("p"))
                .filter(F.length(F.trim("p")) > 0)
                .groupBy(F.trim(F.col("p")).alias("p"))
                .agg(F.count(F.lit(1)).alias("n")))
    assert paras.filter(F.col("n") > 1).count() == 0
    # and nothing vanished: distinct input paragraphs == output paragraphs
    inp = (_df(spark)
           .select(F.explode(F.split("text", "\n")).alias("p"))
           .filter(F.length(F.trim("p")) > 0)
           .select(F.trim(F.col("p")).alias("p")).distinct())
    assert paras.count() == inp.count()


def test_paragraph_stats(spark):
    got = {r.para: (r.n_docs, r.n_occurrences)
           for r in paragraph_stats(_df(spark)).collect()}
    assert got["shared paragraph one"] == (4, 4)
    assert got["shared paragraph two"] == (3, 3)
    assert got["echo echo paragraph"] == (1, 2)
    assert "unique tail of doc one" not in got


def test_detection_exchange_is_text_free(spark):
    """Plan regression: the first-occurrence window shuffles ONLY the
    (md5, doc_id, pos) projection — the paragraph text column must not
    appear in any Exchange's hashpartitioning output, and the only
    text-bearing wire crossing is the final doc_id join (broadcast here)."""
    import re
    out = dedup_paragraphs(_df(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "para" not in m.group(1), plan
    # the window's sort below the detection exchange carries no 'para'
    # column either: every Sort node sorts on _h/doc_id/pos only
    for m in re.finditer(r"Sort \[([^\]]*)\]", plan):
        assert "para" not in m.group(1), plan
