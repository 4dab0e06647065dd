"""PII detection + redaction for web-text corpora.

Pure ``pyspark.sql.functions`` regex work (whole-stage codegen, no Python
worker): at 10^12 docs a scrub pass is a straight map over the corpus, so
the only thing that matters is staying JVM-side and keeping the parquet
scan pruned to the text column.  Patterns are RE2-compatible so the
DuckDB oracle runs the identical expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# deliberately conservative, deterministic patterns (no lookaround so the
# same pattern runs under Java regex AND RE2/DuckDB)
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
}
REDACTIONS = {"email": "<EMAIL>", "ipv4": "<IP>", "phone": "<PHONE>"}


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-kind match counts (long) for one text column."""
    c = _col(text)
    return {kind: F.regexp_count(c, F.lit(pat)).cast("long")
            for kind, pat in PII_PATTERNS.items()}


def scrub_pii(text: Column | str) -> Column:
    """Redact all PII kinds.  Email runs first so 'a@mail2.example.co'
    redacts as one <EMAIL> before the IP pass can bite digit runs in the
    host.  An @ followed by a bare IP is NOT an email under the pattern
    (alpha TLD required), so 'user@1.2.3.4' becomes 'user@<IP>'."""
    c = _col(text)
    for kind in ("email", "ipv4", "phone"):
        c = F.regexp_replace(c, PII_PATTERNS[kind], REDACTIONS[kind])
    return c


def scrub_documents(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """(id, scrubbed text, per-kind counts, has_pii) for every doc."""
    counts = pii_counts(text_col)
    out = df.select(
        F.col(id_col),
        scrub_pii(text_col).alias("scrubbed"),
        *[v.alias(f"n_{k}") for k, v in counts.items()])
    total = sum((F.col(f"n_{k}") for k in PII_PATTERNS), F.lit(0).cast("long"))
    return out.withColumn("has_pii", total > 0)
