"""JSONL source/sink: round-trip fidelity + malformed-line quarantine."""

from pyspark.sql import functions as F

from outliertree_spark.sources.jsonl import (read_documents_jsonl,
                                             write_documents_jsonl,
                                             write_documents_parquet)


def test_jsonl_roundtrip_matches_parquet(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    path = str(tmp_path / "docs_jsonl")
    write_documents_jsonl(docs, path, compression="gzip")
    clean, quarantined = read_documents_jsonl(spark, path)
    assert quarantined.count() == 0
    a = docs.orderBy("doc_id").collect()
    b = clean.select(*docs.columns).orderBy("doc_id").collect()
    assert a == b


def test_jsonl_malformed_lines_quarantined(spark, tmp_path):
    src = tmp_path / "mixed"
    src.mkdir()
    (src / "part-0.jsonl").write_text(
        '{"doc_id": 1, "text": "alpha", "lang": "en", '
        '"source": "s", "n_chars": 5}\n'
        'this is not json\n'
        '{"doc_id": 2, "text": "beta", "lang": "de", '
        '"source": "s", "n_chars": 4}\n'
        '{"doc_id": 3, "text": "gamma", "lang": "fr"\n')
    clean, quarantined = read_documents_jsonl(spark, str(src))
    got = {r["doc_id"]: r["text"] for r in clean.collect()}
    assert got == {1: "alpha", 2: "beta"}
    bad = [r["raw_line"] for r in quarantined.collect()]
    assert len(bad) == 2
    assert any("not json" in b for b in bad)
    assert all(q.endswith("part-0.jsonl")
               for q in (r["file"] for r in quarantined.collect()))


def test_jsonl_ingest_conversion(spark, tmp_path):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    jpath = str(tmp_path / "in_jsonl")
    ppath = str(tmp_path / "out_parquet")
    write_documents_jsonl(docs, jpath)
    clean, _ = read_documents_jsonl(spark, jpath)
    write_documents_parquet(clean, ppath)
    back = spark.read.parquet(ppath)
    assert back.count() == docs.count()
    assert (back.agg(F.sum("n_chars")).first()[0]
            == docs.agg(F.sum("n_chars")).first()[0])
