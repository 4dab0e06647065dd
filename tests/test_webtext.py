"""HTML -> text extraction: the north-rule byte-identity invariant.

The reference's contract (BASELINE.json input_hint) is "byte-identical
extracted text per url": re-extracting from the raw page must reproduce
the stored text exactly.  These tests drive the pure-Catalyst extractor
in operators/webtext.py over adversarial texts and the fixture pages.
"""

import pyspark.sql.functions as F
import pytest

from outliertree_spark.operators.webtext import (
    escape_html_text,
    extraction_parity,
    extraction_summary,
    html_to_text,
    unescape_entities,
)
from outliertree_spark.sources.docs import to_north_shape

from .conftest import SF_DIR

TRICKY_TEXTS = [
    "plain words only",
    "",
    "a & b < c > d",
    "literal &amp; entity and &lt;tag&gt; text",
    "<script>alert('x')</script> inside body text",
    "nested <style>p{}</style> and <!-- comment --> markers",
    "unicode: café über straße 日本語",
    "quotes \" and ' and &quot; raw",
    "&nbsp; literal and &#39; literal",
    "trailing newline\nand\ttabs  double space",
    "amp chains &&& &amp;amp; &amp;lt;",
]


def test_escape_unescape_roundtrip(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TRICKY_TEXTS)],
                               "id int, text string")
    out = df.select(
        "id", "text",
        unescape_entities(escape_html_text(F.col("text"))).alias("rt"),
    ).collect()
    for r in out:
        assert r.rt == r.text, f"roundtrip broke for {r.text!r}"


def test_html_to_text_byte_identity_on_wrapped_pages(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(TRICKY_TEXTS)],
                               "id int, text string")
    page = F.concat(
        F.lit('<html><head><script src="x.js">var q = "<div>";</script>'
              "<style>a{color:#fff}</style></head><body><!-- hdr -->"),
        escape_html_text(F.col("text")),
        F.lit("</body></html>")).cast("binary")
    out = (df.withColumn("html", page)
             .select("text", html_to_text(F.col("html")).alias("ex"))
             .collect())
    for r in out:
        assert r.ex == r.text, f"extraction not byte-identical: {r.text!r}"


def test_html_to_text_drops_noise_and_normalizes(spark):
    raw = ('<HTML><head><SCRIPT type="a">if (1<2) {x}</SCRIPT>'
           "<Style>p {}</Style></head><body>keep"
           "<!-- drop\nmultiline --> <b>bold</b>  text</body></HTML>")
    df = spark.createDataFrame([(raw,)], "html string")
    plain = df.select(html_to_text(F.col("html")).alias("t")).first().t
    assert "<" not in plain and ">" not in plain
    assert "if (1<2)" not in plain
    assert "p {}" not in plain
    assert "drop" not in plain
    assert "keep" in plain and "bold" in plain and "text" in plain
    norm = df.select(
        html_to_text(F.col("html"), normalize_ws=True).alias("t")).first().t
    assert norm == "keep bold text"


def test_fixture_pages_hold_invariant(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = to_north_shape(docs, plant=True)
    summary = extraction_summary(pages).first()
    assert summary.n_mismatch == 0
    assert summary.byte_identical
    assert summary.n_rows == docs.count()
    assert extraction_parity(pages).count() == 0


def test_parity_flags_corrupted_rows(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = to_north_shape(docs)
    corrupted = pages.withColumn(
        "text",
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.col("text"), F.lit("!TAMPERED")))
         .otherwise(F.col("text")))
    bad = extraction_parity(corrupted)
    got = {r.doc_id for r in bad.select("doc_id").collect()}
    expect = {r.doc_id for r in docs.filter(F.col("doc_id") % 7 == 0)
              .select("doc_id").collect()}
    assert got == expect
    row = bad.orderBy("doc_id").first()
    assert row.n_chars_expected == row.n_chars_extracted + len("!TAMPERED")


CANON_CASES = [
    ("HTTP://Example.COM:80/a?utm_source=x&b=2&a=1#frag",
     "http://example.com/a?a=1&b=2"),
    ("https://Host.com:443", "https://host.com/"),
    ("https://host.com:8443/p", "https://host.com:8443/p"),
    ("http://h.com/p?", "http://h.com/p"),
    ("http://h.com/p?fbclid=abc", "http://h.com/p"),
    ("http://h.com:8080/p?z=1&y=2&utm_campaign=c",
     "http://h.com:8080/p?y=2&z=1"),
    ("no-scheme/path#frag", "no-scheme/path"),
    ("FTP://Files.example.com:21/x", "ftp://files.example.com:21/x"),
]


def test_canonicalize_url_cases(spark):
    from outliertree_spark.operators.webtext import canonicalize_url
    df = spark.createDataFrame([(u, want) for u, want in CANON_CASES],
                               "url string, want string")
    out = df.select("url", "want",
                    canonicalize_url(F.col("url")).alias("got")).collect()
    for r in out:
        assert r.got == r.want, f"{r.url!r}: got {r.got!r}, want {r.want!r}"


def test_canonical_duplicate_urls(spark):
    from outliertree_spark.operators.webtext import canonical_duplicate_urls
    rows = [(1, "http://A.com/x?utm_source=t"),
            (2, "HTTP://a.COM:80/x"),
            (3, "http://a.com/x"),
            (4, "http://b.com/y"),
            (5, "http://b.com/y?real=1")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {r.canonical_url: (r.n_docs, r.keep_id)
           for r in canonical_duplicate_urls(df).collect()}
    assert got == {"http://a.com/x": (3, 1)}


def test_suite_extraction_parity_check(spark):
    from outliertree_spark.config import ValidationConfig
    from outliertree_spark.suite import ValidationSuite

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = to_north_shape(docs).withColumn(
        "text",
        F.when(F.col("doc_id") == 3, F.lit("swapped out"))
         .otherwise(F.col("text")))
    suite = (ValidationSuite(ValidationConfig())
             .add_extraction_parity())
    suite.fit(pages.select("doc_id", "lang", "source"), id_cols=["doc_id"])
    violations, verdicts = suite.run(pages, partition_col="source",
                                     id_cols=["doc_id"])
    ext = violations.filter(F.col("check") == "extract_text")
    assert [r.doc_id for r in ext.select("doc_id").collect()] == [3]


def test_extraction_stays_jvm_side(spark):
    """The extractor must not leave codegen: no Python/Arrow eval nodes
    and the scan under it prunes to the columns actually needed."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pages = to_north_shape(docs)
    plan = (pages.select(html_to_text(F.col("html")).alias("t"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_url_blocklist_suffix_and_patterns(spark):
    from outliertree_spark.operators.webtext import url_blocklist_filter
    rows = [
        (1, "https://bad.example.com/a"),          # exact host
        (2, "https://sub.bad.example.com/a"),      # subdomain suffix
        (3, "https://notbad.example.com/a"),       # NOT a dot-boundary match
        (4, "https://ok.com/casino/x"),            # pattern hit
        (5, "https://ok.com/fine"),                # clean
        (6, "HTTPS://BAD.EXAMPLE.COM:8080/b"),     # case + port
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = url_blocklist_filter(df, hosts=["bad.example.com"],
                                patterns=[r"/casino/"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [3, 5]
    blocked = url_blocklist_filter(df, hosts=["bad.example.com"],
                                   patterns=[r"/casino/"], keep=False)
    assert sorted(r["doc_id"] for r in blocked.collect()) == [1, 2, 4, 6]
    # hosts-only and patterns-only modes
    assert sorted(r["doc_id"] for r in url_blocklist_filter(
        df, hosts=["bad.example.com"]).collect()) == [3, 4, 5]
    assert sorted(r["doc_id"] for r in url_blocklist_filter(
        df, patterns=[r"/casino/"]).collect()) == [1, 2, 3, 5, 6]


def test_url_blocklist_evasions_and_null(spark):
    """Userinfo and trailing-dot FQDN forms must still match the
    blocked host, and NULL urls are kept (not silently dropped from
    both outputs) so kept + blocked partition the input."""
    from outliertree_spark.operators.webtext import url_blocklist_filter
    rows = [
        (1, "https://x@bad.example.com/p"),      # userinfo evasion
        (2, "https://bad.example.com./p"),       # trailing-dot FQDN
        (3, "https://u:pw@sub.bad.example.com./p"),
        (4, None),                               # NULL url
        (5, "https://fine.com/x"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    kept = url_blocklist_filter(df, hosts=["bad.example.com"],
                                patterns=[r"/casino/"])
    blocked = url_blocklist_filter(df, hosts=["bad.example.com"],
                                   patterns=[r"/casino/"], keep=False)
    k = sorted(r["doc_id"] for r in kept.collect())
    b = sorted(r["doc_id"] for r in blocked.collect())
    assert k == [4, 5] and b == [1, 2, 3]
    assert len(k) + len(b) == df.count()
