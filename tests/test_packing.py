"""Sequence packing (operators/packing.py): placement invariants,
determinism under repartitioning, DuckDB parity for the md5_60 flavor,
and the text-free-exchange plan guard."""
import re

import pytest
from pyspark.sql import functions as F

from outliertree_spark.operators.packing import pack_sequences, packing_stats

CTX = 16
SHARDS = 4


def _df(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(1 + (i * 7) % 29)))
            for i in range(60)]
    rows.append((60, ""))        # empty doc: occupies no tokens
    rows.append((61, "   "))     # whitespace-only: token_count 0
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(scope="module")
def placed(spark):
    return pack_sequences(_df(spark), CTX, SHARDS).collect()


def test_empty_docs_dropped(placed):
    ids = {r.doc_id for r in placed}
    assert 60 not in ids and 61 not in ids and len(ids) == 60


def test_stream_is_gapless_per_shard(placed):
    """Within a shard, sorted by tok_start, each doc starts exactly
    where the previous ended — the concatenated stream has no holes and
    no overlaps, i.e. the cumsum really is a valid packing."""
    by_shard = {}
    for r in placed:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.tok_start)
        pos = 0
        for r in rows:
            assert r.tok_start == pos, (shard, r)
            pos += r.n_tok


def test_slot_arithmetic(placed):
    for r in placed:
        assert r.seq_id == r.tok_start // CTX
        assert r.offset_in_seq == r.tok_start % CTX
        end = r.tok_start + r.n_tok - 1
        assert r.n_seqs == end // CTX - r.seq_id + 1
        assert r.n_seqs >= 1


def test_deterministic_under_repartition(spark, placed):
    got = pack_sequences(_df(spark).repartition(7), CTX, SHARDS).collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, placed))


def test_md5_flavor_matches_duckdb(spark):
    import duckdb
    pdf = _df(spark).toPandas()
    got = sorted(map(tuple, pack_sequences(
        _df(spark), CTX, SHARDS, hash_kind="md5_60").collect()))
    want = sorted(map(tuple, duckdb.connect().execute(f"""
        WITH t AS (
          SELECT doc_id,
                 CASE WHEN length(trim(text)) = 0 THEN 0
                      ELSE len(list_filter(string_split(trim(text), ' '),
                               t -> t <> '')) END AS n_tok,
                 CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'pack'),
                                     1, 15) AS BIGINT) AS h
          FROM pdf
        ), s AS (
          SELECT doc_id, n_tok, h % {SHARDS} AS shard,
                 COALESCE(SUM(n_tok) OVER (PARTITION BY h % {SHARDS}
                          ORDER BY h, doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS tok_start
          FROM t WHERE n_tok > 0
        )
        SELECT doc_id, shard, n_tok, tok_start,
               tok_start // {CTX} AS seq_id,
               tok_start % {CTX} AS offset_in_seq,
               (tok_start + n_tok - 1) // {CTX} - tok_start // {CTX} + 1
                 AS n_seqs
        FROM s
    """).fetchall()))
    assert got == want


def test_packing_stats(spark):
    stats = {r.shard: r for r in
             packing_stats(pack_sequences(_df(spark), CTX, SHARDS),
                           CTX).collect()}
    placed = pack_sequences(_df(spark), CTX, SHARDS).collect()
    by_shard = {}
    for r in placed:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        s = stats[shard]
        total = sum(r.n_tok for r in rows)
        assert s.n_docs == len(rows)
        assert s.total_tokens == total
        assert s.n_sequences == -(-total // CTX)
        assert s.pad_waste == s.n_sequences * CTX - total
        assert s.boundary_docs == sum(1 for r in rows if r.n_seqs > 1)


def test_exchange_is_text_free(spark):
    """Plan guard: the one exchange partitions by shard and carries only
    the (doc_id, n_tok, _h) projection — 'text' must not appear in any
    Exchange's hashpartitioning key list or any Sort's key list."""
    out = pack_sequences(_df(spark), CTX, SHARDS)
    plan = out._jdf.queryExecution().executedPlan().toString()
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text" not in m.group(1), plan
    for m in re.finditer(r"Sort \[([^\]]*)\]", plan):
        assert "text" not in m.group(1), plan
    # and exactly one shuffle in the whole job
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_xxhash_flavor_valid_packing(spark):
    got = pack_sequences(_df(spark), CTX, SHARDS,
                         hash_kind="xxhash64").collect()
    by_shard = {}
    for r in got:
        by_shard.setdefault(r.shard, []).append(r)
    assert len(got) == 60
    for rows in by_shard.values():
        rows.sort(key=lambda r: r.tok_start)
        pos = 0
        for r in rows:
            assert r.tok_start == pos
            pos += r.n_tok


def test_precounted_tokens_column(spark):
    d = _df(spark).withColumn("n", F.lit(5))
    got = pack_sequences(d, CTX, SHARDS, token_count_col="n").collect()
    assert len(got) == 62 and all(r.n_tok == 5 for r in got)


def test_md5_60_full_magnitude_parity(spark):
    """VERDICT r05 probe (b): the md5_60 hash is consumed at FULL 60-bit
    magnitude only by packing (sampling reduces it mod 1e6), so a
    high-bit divergence between Spark's conv(substr(md5),16,10) and
    DuckDB's CAST('0x'||... AS BIGINT) would surface only here.  Pin
    bit-exact equality over a wide id domain (small, large, 2^31/2^53
    boundary ids)."""
    import duckdb
    ids = ([0, 1, 7, 42] + [2**31 - 1, 2**31, 2**40 + 12345]
           + [2**53 - 1, 10**15 + 7] + list(range(100000, 100200)))
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = dict(df.select(
        "doc_id",
        F.conv(F.substring(F.md5(F.concat(F.col("doc_id").cast("string"),
                                          F.lit("pack"))), 1, 15), 16, 10)
        .cast("long").alias("h")).collect())
    pdf = df.toPandas()
    want = dict(duckdb.connect().execute("""
        SELECT doc_id,
               CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'pack'),
                                   1, 15) AS BIGINT) AS h
        FROM pdf
    """).fetchall())
    assert got == want
    assert max(got.values()).bit_length() == 60  # full magnitude exercised
