"""Deduplication operators for document tables.

Exact (hash group-by), MinHash + LSH banding (shingle -> minhash ->
band -> bucket join), SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup.  All Spark-native: hashing stays JVM-side
(xxhash64/md5 inside whole-stage codegen).

Scale-critical shapes:

- Shingles are built ROW-LOCALLY (``transform(sequence)`` over the token
  array).  The round-1 implementation posexploded every token and ran
  ``lead`` over ``Window.partitionBy(doc_id)`` — a full shuffle of the
  tokenized corpus before any aggregation, which dominates everything at
  real scale.  Row-local construction has NO exchange before the
  signature aggregation (verified in the plan), and the minhash group-by
  combines map-side (one partial row per doc), so the only shuffled data
  is one 64-long vector per document.
- Every LSH/blocking self-join is guarded by a bucket-size cap
  (``bucket_cap``): a degenerate key (empty/boilerplate text, zero
  vectors) otherwise turns the candidate join quadratic.  Oversized
  buckets are dropped (they carry no similarity signal); see
  ``similarity.oversized_buckets`` for monitoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .similarity import banded_lsh_pairs, bucket_pairs

# 2^31-1: products of two residues stay < 2^62, safe for ANSI long math
MERSENNE = (1 << 31) - 1


def _spread(df: DataFrame) -> DataFrame:
    """Fan a narrow input out across the cluster before per-row-heavy work.

    Small tables often arrive as a single parquet file (one scan
    partition); everything downstream would run single-threaded.  At real
    scale inputs are many files and this is a no-op."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, par // 2):
        return df.repartition(2 * par)
    return df


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (text_hash, keep_id, n_dups)."""
    h = F.md5(F.col(text_col)).alias("text_hash")
    return (df.select(h, F.col(id_col))
              .groupBy("text_hash")
              .agg(F.min(id_col).alias("keep_id"),
                   F.count(F.lit(1)).alias("n_dups"))
              .filter(F.col("n_dups") > 1))


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep one row (lowest id) per distinct text."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (df.withColumn("_rn", F.row_number().over(w))
              .filter(F.col("_rn") == 1).drop("_rn"))


def shingle_array(text_col: str = "text", k: int = 3):
    """Column: array of the k-word shingles of the text, built row-locally
    (``transform(sequence(0, n-k), i -> array_join(slice(toks, i+1, k)))``)
    — no exchange, no window.  Duplicate shingles are kept (harmless for
    minhash: duplicates cannot change a min)."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    idx = F.sequence(F.lit(0), n - k)
    sh = F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    return F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))


def shingle_hash_array(text_col: str = "text", k: int = 3):
    """Column: array of ~2^40-space shingle IDs built ARITHMETICALLY from
    per-token hashes (rolling modular combine over ``zip_with`` of
    shifted hash arrays) — no shingle strings are ever materialized.

    This is the hot-path twin of :func:`shingle_array`: identical shingle
    *identity* semantics (two shingles share an ID iff their k tokens
    match) absent hash collisions, at ~8x less interpreted-HOF cost than
    building ``array_join(slice(...))`` strings (measured on the
    repetition operator: 6.85s -> 0.81s at sf0.1).  Collision bound:
    IDs live in a prime ~2^40 space, so P(two distinct shingles of one
    doc collide) ~ (shingles_per_doc^2 / 2) / 2^40 ~ 5e-9 — invisible
    to minhash signatures or Jaccard set arithmetic."""
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(toks)
    M = F.lit(1099511627689)  # prime just under 2^40
    ha = F.transform(toks, lambda t: F.pmod(F.xxhash64(t), M))
    m = n - k + 1
    acc = F.slice(ha, 1, m)
    for j in range(1, k):
        acc = F.zip_with(acc, F.slice(ha, 1 + j, m),
                         lambda a, b: F.pmod(a * F.lit(1000003) + b, M))
    return F.when(n >= k, acc).otherwise(F.array().cast("array<long>"))


def shingle_arrays(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, _sh array<string>) of DISTINCT k-word shingles, row-local
    build, cut from the optimizer with a lazy ``localCheckpoint``.

    The token array is materialized first and the shingle table is cut
    from the optimizer: exploding a nested-HOF expression directly makes
    the optimizer re-inline the token split into every shingle position —
    O(P^2) splitting per doc (the same pathology measured and fixed in
    ``text.winnowing_fingerprints``).  Consumers that need both the
    per-doc shingle COUNT and the exploded rows read this one
    materialization (round 6: novelty_scores' per-doc gram count moved
    from a second explode+aggregate pass to a row-local ``size`` over
    this table — one fewer corpus aggregate, identical output)."""
    d1 = _spread(df).select(
        F.col(id_col),
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+").alias("_t"))
    t = F.col("_t")
    n = F.size(t)
    idx = F.sequence(F.lit(0), n - k)
    sh = F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, k), " "))
    arr = F.when(n >= k, sh).otherwise(F.array().cast("array<string>"))
    return d1.select(F.col(id_col),
                     F.array_distinct(arr).alias("_sh")) \
             .localCheckpoint(eager=False)


def shingle_rows(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle) exploded DISTINCT k-word shingles (see
    :func:`shingle_arrays` for the build/checkpoint discipline)."""
    d2 = shingle_arrays(df, id_col, text_col, k)
    return d2.select(F.col(id_col), F.explode("_sh").alias("shingle"))


def shingles(df: DataFrame, text_col: str = "text", k: int = 3,
             out_col: str = "shingles", id_col: str = "doc_id") -> DataFrame:
    """Distinct k-word shingles per document as an array column
    (row-local: no group-by)."""
    return df.withColumn(out_col, F.array_distinct(shingle_array(text_col, k)))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k_shingle: int = 3,
                       n_hashes: int = 64, seed: int = 42) -> DataFrame:
    """(id, signature array<long>) via n_hashes independent affine hashes
    over xxhash64 shingle ids.

    Shape matters at scale: shingles are built row-locally, exploded
    WITHIN the partition, and reduced by 64 ``min`` aggregates — plain
    arithmetic inside whole-stage codegen with map-side partial
    aggregation, so the exchange carries one signature per document, not
    the corpus' tokens.  A/B measured (round 4, sf0.1, interleaved
    minima): this form 1.94s vs 3.48s for the exchange-free row-local
    twin (``transform`` + ``array_min`` per hash over the shingle
    array) — 64 interpreted HOF passes cost more than the codegen'd
    aggregate, and the avoided exchange is only one signature row per
    document anyway, so explode+agg is the keeper at every scale.  Empty/short docs (< k tokens) get the identity
    signature (MERSENNE per slot) and can never collide with real bands
    below (their band rows are dropped by the cap or match only each
    other; callers filter id_a < id_b pairs by verify stage anyway)."""
    import random
    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, MERSENNE), rng.randrange(0, MERSENNE))
              for _ in range(n_hashes)]
    # arithmetic shingle IDs (shingle_hash_array) instead of exploded
    # shingle strings: same row-local/no-exchange shape, ~2x less
    # per-row HOF cost (measured; see shingle_hash_array docstring).
    # NO array_distinct before the explode (round 6): a duplicate
    # shingle cannot change any of the 64 mins, so signatures are
    # identical without the dedup pass — the extra duplicate rows feed
    # the map-side-combined aggregate, which is cheaper than the
    # per-row distinct (measured 0.96s -> 0.82s on the signature stage
    # at sf0.1).
    ex = (_spread(df)
          .select(F.col(id_col),
                  F.explode(
                      shingle_hash_array(text_col, k_shingle)).alias("_sh"))
          .withColumn("_h", F.pmod(F.col("_sh"), F.lit(MERSENNE))))
    # one F.expr for the whole 64-min array: building the aggregates as
    # n_hashes x ~6 Column method calls cost ~1.1s of py4j round trips
    # PER QUERY BUILD (driver-side, before any executor work — measured
    # with cProfile round 5); a single SQL string is one round trip and
    # the resulting plan is bit-identical (A/B: signatures equal on all
    # 5000 sf0.1 docs, build+exec 1.99s -> 1.25s interleaved minima)
    mins = ",".join(f"min((_h * {a}L + {b}L) % {MERSENNE}L)"
                    for a, b in coeffs)
    return (ex.groupBy(id_col)
              .agg(F.expr(f"array({mins})").alias("signature"))
              .select(F.col(id_col), "signature"))


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k_shingle: int = 3,
                           n_hashes: int = 64, n_bands: int = 16,
                           seed: int = 42,
                           bucket_cap: int = 10000) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) from LSH banding:
    explode signatures into (band, band_hash) buckets, self-join buckets
    (cap-guarded)."""
    # materialize the N x (64 longs) signature table; single-referenced
    # since the round-4 bucket_pairs expansion, kept for composition
    # safety (see simhash_near_dups).  The round-3 self-join shape
    # recomputed the shingle aggregate per reference: 3.50s -> 2.73s at
    # sf0.1 from materializing alone.  Round-5 A/B of lineage-cut
    # flavors (interleaved minima, sf0.1 end-to-end with the Jaccard
    # verify): ckpt+ckpt 2.67s beats no-sig-ckpt 2.78s and both
    # persist() variants (3.2/3.7s — InMemoryRelation columnar
    # materialization costs more than the checkpoint write here).
    sigs = minhash_signatures(df, id_col, text_col, k_shingle, n_hashes,
                              seed).localCheckpoint(eager=False)
    return lsh_band_pairs(sigs, id_col, n_hashes, n_bands, bucket_cap)


def lsh_band_pairs(sigs: DataFrame, id_col: str = "doc_id",
                   n_hashes: int = 64, n_bands: int = 16,
                   bucket_cap: int = 10000) -> DataFrame:
    """Banding + capped bucket self-join over a PRECOMPUTED
    (id, signature) table: candidate pairs (id_a < id_b).

    Factored out of :func:`minhash_lsh_candidates` so pipelines that
    collapse exact duplicates first
    (:func:`~outliertree_spark.operators.components.near_dup_components`)
    can band over representative signatures instead of one row per
    document copy."""
    rows_per_band = n_hashes // n_bands
    bands = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    b = sigs.select(F.col(id_col), F.col("signature"), bands)
    b = b.withColumn(
        "band_hash",
        F.xxhash64(F.col("band"),
                   F.concat_ws(",", F.transform(
                       F.slice(F.col("signature"),
                               F.col("band") * rows_per_band + 1, rows_per_band),
                       lambda x: x.cast("string")))))
    p = bucket_pairs(b.select(id_col, "band", "band_hash"),
                     ["band", "band_hash"], [id_col], id_col, bucket_cap)
    return (p.select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"))
             .distinct())


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k_shingle: int = 3) -> DataFrame:
    """Exact Jaccard similarity over word shingles for candidate pairs
    (the verify stage after LSH)."""
    # the pairs plan is referenced twice below (ids + join); materialize
    # it once -- candidate pairs are small by construction
    df_pairs = df_pairs.localCheckpoint(eager=False)
    # only docs that appear in a candidate pair need their shingles.
    # ONE reference via explode(array(id_a, id_b)) instead of the union
    # of two selects: the union shape read the checkpointed table twice
    # and unioned before the distinct — measured 1.36s -> 1.15s on
    # minhash_dups end-to-end (round-6 interleaved minima, rows equal).
    ids = (df_pairs.select(F.explode(F.array("id_a", "id_b")).alias(id_col))
           .distinct())
    docs = docs.join(F.broadcast(ids), id_col, "left_semi")
    # hashed shingle sets: Jaccard over ID sets equals Jaccard over the
    # string sets absent collisions (see shingle_hash_array bound)
    sh = docs.select(
        F.col(id_col),
        F.array_distinct(shingle_hash_array(text_col, k_shingle))
         .alias("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    j = df_pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select("id_a", "id_b",
                    (inter / union).alias("jaccard"))


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64, token_hash: str = "xxhash64") -> DataFrame:
    """SimHash over distinct word tokens: per-bit majority vote of token
    hashes.

    One exploded pass: tokens explode WITHIN the partition, the group-by
    packs the per-bit counters 2-to-a-long (32-bit fields), so a single
    codegen'd hash aggregate carries ``bits/2`` sum buffers and the
    exchange ``bits/2`` longs per doc.  The round-1 form evaluated 64
    interpreted ``size(filter(array))`` higher-order expressions per row
    (~16s at sf0.1); round 2's 64 conditional sums cut that ~8x; the
    packed form shaves more off the aggregate stage.  32-bit fields are
    overflow-proof for any Spark-representable document (see inline
    arithmetic below); the earlier 16-bit packing was not.

    ``token_hash``: "xxhash64" (64-bit, fastest — the scale default) or
    "md5_60" (60-bit from the first 15 hex chars of md5 — bit-for-bit
    reproducible in DuckDB via ``CAST('0x'||substr(md5(t),1,15) AS
    BIGINT)``, which is what makes the simhash pipeline SQL-oracleable;
    use bits<=60 with it)."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    ex = _spread(df).select(F.col(id_col), F.explode_outer(toks).alias("_tok"))
    if token_hash == "md5_60":
        assert bits <= 60, "md5_60 provides 60 hash bits"
        ex = ex.withColumn(
            "_h", F.conv(F.substring(F.md5("_tok"), 1, 15), 16, 10).cast("long"))
    else:
        ex = ex.withColumn("_h", F.xxhash64("_tok"))
    # Pack 2 per-bit counters into 32-bit fields of one long, so the
    # hash aggregate carries bits/2 sum buffers instead of one per bit
    # (60 -> 30 slots; the round-3 3x16-bit packing was faster still but
    # silently corrupted the hash for docs with >65535 distinct tokens —
    # real in a 100TB web corpus).  A 32-bit field cannot overflow for
    # any document Spark can hold: strings cap at 2GB, so distinct
    # tokens per doc < 2^31 < 2^32 (no carry into the high field), and
    # the packed sum stays < 2^31 * 2^32 = 2^63 (no signed overflow
    # under ANSI mode).  Correct by arithmetic, no runtime guard needed.
    # The pack/unpack loops are built as SQL strings (one F.expr each)
    # rather than per-bit Column method chains: ~600 py4j round trips
    # per query BUILD otherwise (driver-side; cProfile round 5), and
    # the resulting plans are bit-identical — A/B: simhash equal on all
    # 5000 sf0.1 docs for both md5_60/60-bit and xxhash64/64-bit,
    # build+exec 2.64s -> 1.29s interleaved minima.
    fields_per_long = 2
    field_bits = 32
    n_longs = (bits + fields_per_long - 1) // fields_per_long
    agg_strs = []
    for j in range(n_longs):
        terms = []
        for f in range(fields_per_long):
            i = j * fields_per_long + f
            if i >= bits:
                break
            terms.append(
                f"(CAST((shiftrightunsigned(_h, {i}) & 1) AS BIGINT)"
                f" * CAST({1 << (field_bits * f)} AS BIGINT))")
        agg_strs.append(f"sum({' + '.join(terms)})")
    g = ex.groupBy(id_col).agg(
        F.count("_h").alias("_n"),
        *[F.expr(s).alias(f"_p{j}") for j, s in enumerate(agg_strs)])
    ors = ["CAST(0 AS BIGINT)"]
    for i in range(bits):
        j, f = i // fields_per_long, i % fields_per_long
        cnt = f"(shiftrightunsigned(_p{j}, {field_bits * f}) & 4294967295)"
        if i < 63:
            mask = f"CAST({1 << i} AS BIGINT)"
        else:  # -2^63 has no negatable SQL literal; build it arithmetically
            mask = ("(CAST(-9223372036854775807 AS BIGINT)"
                    " - CAST(1 AS BIGINT))")
        ors.append(f"(CASE WHEN {cnt} * 2 >= _n THEN {mask}"
                   f" ELSE CAST(0 AS BIGINT) END)")
    sh = F.expr(" | ".join(ors))
    return g.select(F.col(id_col), sh.alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      n_blocks: int = 4, bits: int = 64,
                      token_hash: str = "xxhash64",
                      bucket_cap: int = 10000) -> DataFrame:
    """Near-dup pairs by SimHash: block the hash into ``n_blocks`` keys
    (pigeonhole: <= n_blocks-1 differing bits -> one block identical, so
    recall is EXACT for max_hamming < n_blocks), bucket-join on each
    block (cap-guarded), then exact Hamming filter."""
    # Materialize the N x 16-byte signature table (the same table a
    # production pipeline persists before pairing).  With the round-4
    # bucket_pairs expansion the plan references it only once, so the
    # checkpoint is no longer load-bearing (A/B measured a wash, deltas
    # inside host noise both ways); it is kept because any caller that
    # composes this result into a multi-reference plan would otherwise
    # silently recompute the exploded-token aggregate — the round-3
    # self-join shape did exactly that, 4 pipeline copies / 13
    # exchanges, and cost 4.41s vs 3.34s at sf0.1.
    sh = simhash(df, id_col, text_col, bits, token_hash) \
        .localCheckpoint(eager=False)
    block_width = bits // n_blocks
    blocks = F.explode(F.array(*[
        F.struct(F.lit(i).alias("blk"),
                 F.shiftrightunsigned(F.col("simhash"), i * block_width)
                  .bitwiseAND(F.lit((1 << block_width) - 1)).alias("key"))
        for i in range(n_blocks)])).alias("b")
    e = sh.select(id_col, "simhash", blocks).select(
        id_col, "simhash", F.col("b.blk"), F.col("b.key"))
    # one-exchange pair expansion (bucket_pairs) instead of the aliased
    # self-join; hamming filter BEFORE the distinct: bit_count is a few
    # cycles per candidate while distinct is an exchange — dropping the
    # far misses first means the dedup shuffle carries only true
    # near-dups (a pair colliding in several blocks is deduped after,
    # identically)
    p = bucket_pairs(e, ["blk", "key"], [id_col, "simhash"], id_col,
                     bucket_cap)
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    return (p.withColumn("hamming", ham)
             .filter(F.col("hamming") <= max_hamming)
             .select(F.col(f"a.{id_col}").alias("id_a"),
                     F.col(f"b.{id_col}").alias("id_b"), "hamming")
             .distinct())


def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        min_cosine: float = 0.95,
                        n_tables: int = 16, n_planes: int = 8,
                        seed: int = 42,
                        bucket_cap: int = 10000) -> DataFrame:
    """Embedding-cosine near-dups: banded sign-LSH candidate join
    (OR-construction over ``n_tables`` tables of ``n_planes`` Gaussian
    hyperplanes — recall ~94% at cosine 0.8, >0.999 at 0.95 with the
    defaults) then exact cosine re-rank."""
    pairs = banded_lsh_pairs(emb, id_col, vec_col, n_tables, n_planes,
                             seed, bucket_cap)
    # norms once per vector before the pair join (bit-identical: same
    # fold, same na * nb operand order as cosine_expr)
    from .similarity import dot_expr, norm_expr
    v = emb.select(F.col(id_col), F.col(vec_col),
                   norm_expr(F.col(vec_col)).alias("_n"))
    a = v.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"),
                 F.col("_n").alias("_na"))
    b = v.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"),
                 F.col("_n").alias("_nb"))
    j = pairs.join(a, "id_a").join(b, "id_b")
    return (j.withColumn("cosine",
                         dot_expr("v_a", "v_b")
                         / (F.col("_na") * F.col("_nb")))
             .filter(F.col("cosine") >= min_cosine)
             .select("id_a", "id_b", "cosine"))
