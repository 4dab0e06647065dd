"""JSONL (newline-delimited JSON) source/sink for the documents shape.

Web-crawl interchange dumps (WARC post-processing, Dolma, many public
corpora) ship as gzipped JSONL; this source reads them into the same
frame `sources/docs.py` produces from parquet, so every operator and
query runs unchanged on either format.

Scale notes:

- ALWAYS pass an explicit schema: schema inference reads the entire
  input once before the real scan — a 100 TB corpus would be scanned
  twice.  `DOCS_SCHEMA` matches the fixture documents table.
- Malformed lines go to a quarantine column instead of killing the job
  (`PERMISSIVE` + `columnNameOfCorruptRecord`): at crawl scale some
  records are always broken, and dropping them silently
  (mode=DROPMALFORMED) hides data loss from the verdict counts.
  `read_documents_jsonl` splits the frame into (clean, quarantined) so
  the caller can count/inspect the bad rows — the validation engine's
  own flag-don't-drop convention.
- JSON text decoding is JVM-side (Jackson) and pipeline-width
  predicates still push down to the scan, but JSONL has no row-group
  statistics — at 100 TB keep JSONL at the INGEST edge and convert to
  parquet (write_documents_parquet) before iterative workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

DOCS_SCHEMA = ("doc_id long, text string, lang string, source string, "
               "n_chars long")
_CORRUPT = "_corrupt_record"


def read_documents_jsonl(spark, path: str,
                         schema: str = DOCS_SCHEMA,
                         return_raw: bool = False):
    """Read a JSONL documents dump -> (clean, quarantined).

    ``clean`` carries exactly the declared schema; ``quarantined``
    carries (raw line, file) for every record Jackson could not bind.
    Compressed inputs (.gz/.zst per file) are handled transparently by
    the codec layer.

    The parsed input is cache()d (see below); the cached relation is
    released when the plan is garbage-collected (Spark's
    ContextCleaner), but long-lived ingest sessions doing many reads
    should release it deterministically: pass ``return_raw=True`` to
    get ``(clean, quarantined, raw)`` and call ``raw.unpersist()``
    once both outputs are materialized."""
    raw = (spark.read
           .schema(f"{schema}, {_CORRUPT} string")
           .option("mode", "PERMISSIVE")
           .option("columnNameOfCorruptRecord", _CORRUPT)
           .json(path))
    # Spark refuses plans that reference ONLY the corrupt-record column
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parse must be
    # materialized first.  cache() is the documented answer; at true
    # ingest scale, write `clean` out (write_documents_parquet) and the
    # quarantine in the same pass instead of holding the cache.
    # input_file_name() must be captured BEFORE the cache boundary —
    # evaluated after it, the scan context is gone and it returns "".
    raw = raw.withColumn("_src_file", F.input_file_name()).cache()
    # Spark leaves non-corrupt columns NULL for a broken line; the
    # corrupt column holds the raw text only for broken lines.
    clean = raw.filter(F.col(_CORRUPT).isNull()) \
               .drop(_CORRUPT, "_src_file")
    quarantined = (raw.filter(F.col(_CORRUPT).isNotNull())
                      .select(F.col(_CORRUPT).alias("raw_line"),
                              F.col("_src_file").alias("file")))
    if return_raw:
        return clean, quarantined, raw
    return clean, quarantined


def write_documents_jsonl(df: DataFrame, path: str,
                          compression: str = "gzip",
                          mode: str = "overwrite") -> None:
    """Write the documents frame as (compressed) JSONL — the interchange
    sink; one file per partition, so repartition upstream to control
    file sizes."""
    df.write.mode(mode).option("compression", compression).json(path)


def write_documents_parquet(df: DataFrame, path: str,
                            mode: str = "overwrite") -> None:
    """Ingest-edge conversion: JSONL in, parquet out (row-group stats +
    pushdown for everything downstream)."""
    df.write.mode(mode).parquet(path)
