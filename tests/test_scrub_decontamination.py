"""PII scrubbing + test-set decontamination operators."""

import pyspark.sql.functions as F

from outliertree_spark.operators.decontamination import (
    benchmark_grams,
    contamination_scores,
    ngram_hashes,
)
from outliertree_spark.operators.scrub import pii_counts, scrub_documents, scrub_pii


def test_scrub_pii_kinds(spark):
    rows = [
        (1, "mail me at john.doe+x@sub.example.org today"),
        (2, "server at 192.168.0.1 and 10.0.0.255 up"),
        (3, "call 555-123-4567 or 555.987.6543"),
        (4, "nothing sensitive here"),
        (5, "mixed: a@b.io on 8.8.8.8 dial 111-222-3333"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in scrub_documents(df).collect()}
    assert got[1].scrubbed == "mail me at <EMAIL> today"
    assert got[1].n_email == 1 and got[1].has_pii
    assert got[2].scrubbed == "server at <IP> and <IP> up"
    assert got[2].n_ipv4 == 2
    assert got[3].scrubbed == "call <PHONE> or <PHONE>"
    assert got[3].n_phone == 2
    assert got[4].scrubbed == rows[3][1] and not got[4].has_pii
    assert got[5].scrubbed == "mixed: <EMAIL> on <IP> dial <PHONE>"


def test_scrub_ordering_and_ip_host(spark):
    # alpha-TLD addresses redact as one <EMAIL> (email pass runs first);
    # an @ followed by a bare IP is not an email under the pattern, so
    # the IP inside it still gets scrubbed
    df = spark.createDataFrame(
        [("a.b@mail2.example.co plus user@1.2.3.4 and 5.6.7.8",)],
        "text string")
    out = df.select(scrub_pii("text").alias("s"),
                    *[v.alias(k) for k, v in pii_counts("text").items()])
    r = out.first()
    assert r.s == "<EMAIL> plus user@<IP> and <IP>"
    assert r.email == 1 and r.ipv4 == 2


def test_ngram_hashes_row_local(spark):
    df = spark.createDataFrame([(1, "a b c d e f"), (2, "a b"), (3, "")],
                               "doc_id long, text string")
    out = {r.doc_id: r.g for r in
           df.select("doc_id", ngram_hashes("text", n=5).alias("g")).collect()}
    assert len(out[1]) == 2  # 'a b c d e', 'b c d e f'
    assert out[2] == [] and out[3] == []


def test_contamination_scores_planted(spark):
    # doc 10 copies benchmark text; doc 11 shares one 5-gram window;
    # doc 12 is clean
    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    docs = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),
         (11, "xx alpha beta gamma delta epsilon yy"),
         (12, "one two three four five six seven")],
        "doc_id long, text string")
    got = {r.doc_id: r for r in
           contamination_scores(docs, bench, n=5).collect()}
    assert got[10].n_contaminated == 2 and got[10].contaminated
    assert got[11].n_contaminated == 1 and got[11].contaminated
    assert got[12].n_contaminated == 0 and not got[12].contaminated
    assert got[10].n_grams == 2 and got[11].n_grams == 3


def test_contamination_flavors_agree(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    train = docs.filter(F.col("doc_id") % 17 != 0)
    outs = {}
    for flavor in ("xxhash64", "md5_60", "raw", "arith", "xx_chain"):
        outs[flavor] = sorted(
            (r.doc_id, r.n_grams, r.n_contaminated, r.contaminated)
            for r in contamination_scores(train, bench, n=5,
                                          token_hash=flavor).collect())
    assert (outs["xxhash64"] == outs["md5_60"] == outs["raw"]
            == outs["arith"] == outs["xx_chain"])


def test_contamination_plan_broadcasts_benchmark(spark):
    bench = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    docs = spark.createDataFrame([(2, "a b c d e f")], "doc_id long, text string")
    plan = (contamination_scores(docs, bench)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_md5_60_flavor_matches_duckdb(spark):
    import duckdb
    df = spark.createDataFrame([(1, "the quick brown fox jumps over dog")],
                               "doc_id long, text string")
    got = sorted(df.select(F.explode(
        ngram_hashes("text", n=3, token_hash="md5_60")).alias("g"))
        .toPandas().g.tolist())
    want = sorted(x[0] for x in duckdb.sql("""
        SELECT CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) FROM (
          SELECT array_to_string(t[i:i+2], ' ') AS g FROM (
            SELECT regexp_split_to_array(
                     'the quick brown fox jumps over dog', '\\s+') AS t),
            (SELECT unnest(generate_series(1, 5)) AS i))
    """).fetchall())
    assert got == want
