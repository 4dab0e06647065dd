"""Training-sequence packing (concat-and-chunk, GPT-style).

LLM pre-training consumes fixed-length token sequences (e.g. 2048/4096
tokens); the corpus is variable-length documents.  The standard
pipeline step concatenates documents in a deterministic order and
chunks the stream every ``ctx_len`` tokens, letting documents span
chunk boundaries — zero padding waste except the final partial chunk.
This module computes each document's PLACEMENT in that packed stream:

    (shard, seq_id, offset_in_seq, n_seqs spanned)

without ever materialising token arrays or shuffling text.

Scale shape (the 10^12-doc argument):

- A single global concatenation order would need a global sort — the
  classic scale-killer.  Real pipelines pack PER SHARD: documents are
  hashed into ``n_shards`` independent streams and packed within each.
  Shards are the parallel unit; ``n_shards`` is sized so one shard's
  (key, n_tok) pairs sort in one task (at 10^12 docs and 1M shards
  that is ~10^6 16-byte rows per task).
- Placement is computed on the (key, n_tok, h) PROJECTION — document
  text never reaches the exchange (plan-asserted in
  tests/test_packing.py).  A writer that needs the text joins the
  placement back on the key, row-local on key-bucketed tables.
- The order within a shard is (hash, key): deterministic under any
  input partitioning, any executor count, and re-runs — the same
  stability contract as operators/sampling.py, and for the same
  reason (re-packing must not silently reshuffle what sequence a
  document landed in between runs).

Two hash flavors, same semantics (see operators/sampling.py):
``xxhash64`` is the whole-stage-codegen scale default; ``md5_60`` is
bit-for-bit reproducible in DuckDB (``CAST('0x' || substr(md5(k),1,15)
AS BIGINT)``), which is what makes the operator SQL-oracleable.

The reference has no packing operator (it is a validation library);
this is a pipeline addition per the build brief.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import token_count


def _hash60(key: Column, salt: str, hash_kind: str) -> Column:
    """Full-resolution salted hash (not reduced mod 1e6): the shard is
    its pmod, the within-shard order its magnitude."""
    if hash_kind == "md5_60":
        return F.conv(F.substring(F.md5(F.concat(key.cast("string"),
                                                 F.lit(salt))), 1, 15),
                      16, 10).cast("long")
    if hash_kind != "xxhash64":
        # fail loud: a typo'd or cross-module flavor ('plain', 'md5')
        # silently falling through to xxhash64 would produce a packing
        # the caller's oracle cannot reproduce
        raise ValueError(f"unknown hash_kind {hash_kind!r}: "
                         f"expected 'md5_60' or 'xxhash64'")
    return F.xxhash64(key.cast("string"), F.lit(salt))


def pack_sequences(df: DataFrame, ctx_len: int, n_shards: int,
                   key_col: str = "doc_id",
                   token_count_col: str | None = None,
                   text_col: str = "text", salt: str = "pack",
                   hash_kind: str = "xxhash64") -> DataFrame:
    """Assign each document its slot in the packed training stream.

    Returns one row per document with ``n_tok > 0`` (empty documents
    occupy no tokens and are dropped, documented here):

    - ``shard``          — pmod(hash(key), n_shards), the independent
                           packing stream the doc belongs to
    - ``n_tok``          — the doc's token count
    - ``tok_start``      — tokens preceding it in its shard's stream
    - ``seq_id``         — tok_start DIV ctx_len (first sequence the
                           doc's tokens land in, numbered per shard)
    - ``offset_in_seq``  — tok_start MOD ctx_len
    - ``n_seqs``         — how many ctx_len sequences the doc spans

    One exchange total, partitioned by ``shard`` and carrying only
    (key, n_tok, h); the per-shard window sort is the parallel unit.
    """
    assert ctx_len > 0 and n_shards > 0
    key = F.col(key_col)
    if token_count_col is None:
        n_tok = token_count(text_col)
    else:
        n_tok = F.col(token_count_col).cast("long")
    h = _hash60(key, salt, hash_kind)
    # project BEFORE the window: the exchange must not carry text
    t = (df.select(key.alias(key_col), n_tok.alias("n_tok"), h.alias("_h"))
           .filter(F.col("n_tok") > 0)
           .withColumn("shard", F.pmod(F.col("_h"), F.lit(n_shards))))
    w = (Window.partitionBy("shard").orderBy("_h", key_col)
               .rowsBetween(Window.unboundedPreceding, -1))
    placed = t.withColumn("tok_start",
                          F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    # integer arithmetic throughout: per-shard token offsets can exceed
    # 2^53 only past ~4e15 tokens/shard, but DIV keeps it exact anyway
    return placed.select(
        key_col, "shard", "n_tok", "tok_start",
        F.expr(f"tok_start DIV {ctx_len}").alias("seq_id"),
        (F.col("tok_start") % ctx_len).alias("offset_in_seq"),
        (F.expr(f"(tok_start + n_tok - 1) DIV {ctx_len}")
         - F.expr(f"tok_start DIV {ctx_len}") + 1).alias("n_seqs"))


def packing_stats(placed: DataFrame, ctx_len: int) -> DataFrame:
    """Per-shard fill report over a :func:`pack_sequences` result:
    docs, total tokens, sequences produced (ceil(total/ctx_len)),
    boundary-crossing docs, and the padding waste of the final partial
    sequence.  Output is n_shards rows — the small side by design."""
    return (placed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("total_tokens"),
        F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0))
         .alias("boundary_docs"))
        .withColumn("n_sequences",
                    F.expr(f"(total_tokens + {ctx_len} - 1) DIV {ctx_len}"))
        .withColumn("pad_waste",
                    F.col("n_sequences") * ctx_len - F.col("total_tokens")))
