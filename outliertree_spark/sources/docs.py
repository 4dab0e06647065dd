"""Common-Crawl-style documents source (the north-rule input shape).

Derives the full fixture schema (url, warc_ts, html, text, lang) from the
driver-provided ``documents.parquet`` (doc_id, text, lang, source,
n_chars) with deterministic column expressions — no external data, no
randomness outside xxhash64.  Optionally plants violations (duplicate
urls, out-of-window timestamps, extreme text lengths, a rare lang) whose
ids are derivable, so tests can assert exact flagged-row sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WINDOW_START = "2024-01-01 00:00:00"
WINDOW_DAYS = 30


def load_documents(spark, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def to_north_shape(docs: DataFrame, plant: bool = False,
                   dup_every: int = 101, late_every: int = 127,
                   huge_every: int = 149) -> DataFrame:
    """(doc_id, url, warc_ts, html, text, lang) derived deterministically.

    Zipf-ish host skew: host index = doc_id % 97 biased by squaring the
    hash fraction, so a few hosts dominate (exercises salting/AQE).
    With ``plant=True``:
      - every ``dup_every``-th doc reuses the previous doc's url
      - every ``late_every``-th doc gets a warc_ts far outside the window
      - every ``huge_every``-th doc's text is repeated 100x
    """
    d = docs
    h = F.abs(F.xxhash64("doc_id"))
    frac = (h % 10000).cast("double") / 10000.0
    host_ix = (F.pow(frac, F.lit(3.0)) * 97).cast("int")  # skewed toward 0
    url = F.concat(F.lit("https://host"), host_ix.cast("string"),
                   F.lit(".example.com/doc/"), F.col("doc_id").cast("string"))
    if plant:
        prev_h = F.abs(F.xxhash64(F.col("doc_id") - 1))
        prev_frac = (prev_h % 10000).cast("double") / 10000.0
        prev_host = (F.pow(prev_frac, F.lit(3.0)) * 97).cast("int")
        url = F.when((F.col("doc_id") % dup_every == 0) & (F.col("doc_id") > 0),
                     F.concat(F.lit("https://host"), prev_host.cast("string"),
                              F.lit(".example.com/doc/"),
                              (F.col("doc_id") - 1).cast("string"))
                     ).otherwise(url)
    secs = (h % (WINDOW_DAYS * 24 * 3600)).cast("long")
    warc_ts = F.timestamp_seconds(
        F.unix_timestamp(F.lit(WINDOW_START)) + secs)
    if plant:
        warc_ts = F.when((F.col("doc_id") % late_every == 0) & (F.col("doc_id") > 0),
                         F.timestamp_seconds(
                             F.unix_timestamp(F.lit(WINDOW_START))
                             + F.lit(400 * 24 * 3600))).otherwise(warc_ts)
    text = F.col("text")
    if plant:
        text = F.when((F.col("doc_id") % huge_every == 0) & (F.col("doc_id") > 0),
                      F.concat_ws(" ", F.array_repeat(F.col("text"), 100))
                      ).otherwise(text)
    # realistic page: head noise (script/style/comment) the extractor must
    # drop, body text entity-escaped so operators/webtext.py::html_to_text
    # recovers `text` BYTE-IDENTICALLY (the north-rule per-row invariant)
    from ..operators.webtext import escape_html_text
    html = F.concat(
        F.lit('<html><head><title>doc '), F.col("doc_id").cast("string"),
        F.lit('</title><script type="text/javascript">var a = 1 < 2;</script>'
              '<style>body{margin:0}</style></head>'
              '<body><!-- warc-extract -->'),
        escape_html_text(text),
        F.lit("</body></html>")).cast("binary")
    return d.select(
        "doc_id",
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        F.col("lang"),
        F.col("source"),
    )


def scale_up(docs: DataFrame, factor: int) -> DataFrame:
    """Deterministically replicate a table ``factor``x with distinct ids
    (bench-only: the driver tables are small; 100 TB behavior needs
    volume).  Each copy re-salts doc_id so url/warc_ts derivations vary."""
    if factor <= 1:
        return docs
    rep = F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("rep")
    n = 10 ** 9
    return (docs.select("*", rep)
                .withColumn("doc_id",
                            F.col("doc_id").cast("long")
                            + F.col("rep").cast("long") * F.lit(n).cast("long"))
                .drop("rep"))


def write_validation_layout(docs: DataFrame, path: str,
                            text_col: str = "text",
                            n_files: int = 128,
                            mode: str = "overwrite") -> None:
    """Materialize the AT-SCALE validation layout: every cheap feature
    the validator needs (``text_len`` today) is computed once at write
    time and stored NEXT TO the raw text, so the validation scan can
    prune the text bytes entirely (ReadSchema without ``text``).

    Measured effect (bench.py pruned ladder, sf0.1-derived 40M rows):
    per-doc CPU halves and scanned bytes drop ~10x vs re-deriving
    ``text_len`` from ``text`` on every run — at 100 TB this is the
    difference between a metadata-sized scan and re-decoding the corpus
    for each validation pass.  ``n_files`` keeps the file count fixed
    regardless of the writing session's parallelism so scan concurrency
    stays row-group-bound at several task waves per core (the round-2
    bench root-cause)."""
    w = docs.withColumn("text_len",
                        F.length(F.col(text_col)).cast("double"))
    w.repartition(n_files).write.mode(mode).parquet(path)


def read_validation_layout(spark, path: str,
                           feature_cols: list[str] | None = None
                           ) -> DataFrame:
    """Read the validation-layout table pruned to the feature columns —
    the text bytes never leave the parquet footers unless explicitly
    selected."""
    df = spark.read.parquet(path)
    cols = feature_cols or [c for c in df.columns if c != "text"]
    return df.select(*cols)
