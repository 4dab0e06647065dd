"""Deduplication operators for document tables.

Exact (hash group-by), MinHash + LSH banding (shingle -> minhash ->
band -> bucket join), SimHash, n-gram Jaccard verification, and
embedding-cosine near-dup.  All Spark-native: hashing stays JVM-side
(xxhash64/md5 inside whole-stage codegen); only the minhash signature
fold uses higher-order column functions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

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


def shingle_rows(df: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle) exploded k-word shingles.

    posexplode + window ``lead`` keeps shingle construction in compiled
    expressions; the array-building ``transform(sequence, slice+concat)``
    form runs interpreted per element and is ~30x slower."""
    df = _spread(df)
    toks = F.split(F.lower(F.col(text_col)), r"\s+")
    ex = df.select(F.col(id_col), F.size(toks).alias("_n"),
                   F.posexplode(toks).alias("_pos", "_tok"))
    w = Window.partitionBy(id_col).orderBy("_pos")
    parts = [F.col("_tok")] + [F.lead("_tok", i).over(w) for i in range(1, k)]
    sh = (ex.withColumn("_sh", F.concat_ws(" ", *parts))
            .filter(F.col("_pos") <= F.greatest(F.col("_n") - k, F.lit(0))))
    return sh.select(F.col(id_col), F.col("_sh").alias("shingle")).distinct()


def shingles(df: DataFrame, text_col: str = "text", k: int = 3,
             out_col: str = "shingles", id_col: str = "doc_id") -> DataFrame:
    """Distinct k-word shingles per document as an array column."""
    rows = shingle_rows(df, id_col, text_col, k)
    arrs = rows.groupBy(id_col).agg(F.collect_set("shingle").alias(out_col))
    return df.join(arrs, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.array()))


def minhash_signatures(df: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text", k_shingle: int = 3,
                       n_hashes: int = 64, seed: int = 42) -> DataFrame:
    """(id, signature array<long>) via n_hashes independent affine hashes
    over xxhash64 shingle ids.

    Shape matters at scale: explode shingles then take 64 ``min`` aggregates
    — plain arithmetic inside whole-stage codegen with map-side partial
    aggregation — rather than per-element higher-order lambdas, which
    Catalyst evaluates interpreted (~20x slower)."""
    import random
    rng = random.Random(seed)
    coeffs = [(rng.randrange(1, MERSENNE), rng.randrange(0, MERSENNE))
              for _ in range(n_hashes)]
    ex = (shingle_rows(df, id_col, text_col, k_shingle)
          .withColumn("_h", F.abs(F.xxhash64("shingle")) % MERSENNE))
    aggs = [F.min((F.col("_h") * F.lit(a) + F.lit(b)) % MERSENNE).alias(f"_m{i}")
            for i, (a, b) in enumerate(coeffs)]
    g = ex.groupBy(id_col).agg(*aggs)
    sig = F.array(*[F.col(f"_m{i}") for i in range(n_hashes)]).alias("signature")
    return g.select(F.col(id_col), sig)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id",
                           text_col: str = "text", k_shingle: int = 3,
                           n_hashes: int = 64, n_bands: int = 16,
                           seed: int = 42) -> DataFrame:
    """Candidate near-duplicate pairs (id_a < id_b) from LSH banding:
    explode signatures into (band, band_hash) buckets, self-join buckets."""
    rows_per_band = n_hashes // n_bands
    sigs = minhash_signatures(df, id_col, text_col, k_shingle, n_hashes, seed)
    bands = F.explode(F.sequence(F.lit(0), F.lit(n_bands - 1))).alias("band")
    b = sigs.select(F.col(id_col), F.col("signature"), bands)
    b = b.withColumn(
        "band_hash",
        F.xxhash64(F.col("band"),
                   F.concat_ws(",", F.transform(
                       F.slice(F.col("signature"),
                               F.col("band") * rows_per_band + 1, rows_per_band),
                       lambda x: x.cast("string")))))
    left = b.select(F.col(id_col).alias("id_a"), "band", "band_hash")
    right = b.select(F.col(id_col).alias("id_b"), "band", "band_hash")
    pairs = (left.join(right, ["band", "band_hash"])
                 .filter(F.col("id_a") < F.col("id_b"))
                 .select("id_a", "id_b").distinct())
    return pairs


def ngram_jaccard(df_pairs: DataFrame, docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  k_shingle: int = 3) -> DataFrame:
    """Exact Jaccard similarity over word shingles for candidate pairs
    (the verify stage after LSH)."""
    # the pairs plan is referenced three times below (ids x2 + join);
    # materialize it once -- candidate pairs are small by construction
    df_pairs = df_pairs.localCheckpoint(eager=False)
    # only docs that appear in a candidate pair need their shingles
    ids = (df_pairs.select(F.col("id_a").alias(id_col))
           .union(df_pairs.select(F.col("id_b").alias(id_col))).distinct())
    docs = docs.join(F.broadcast(ids), id_col, "left_semi")
    sh = shingles(docs, text_col, k_shingle, "sh").select(
        F.col(id_col), F.col("sh"))
    a = sh.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"))
    j = df_pairs.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return j.select("id_a", "id_b",
                    (inter / union).alias("jaccard"))


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64) -> DataFrame:
    """64-bit SimHash over word tokens: per-bit majority vote of token
    hashes, computed as bit-testing aggregates over the token array."""
    toks = F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+"))
    d = _spread(df).select(F.col(id_col),
                           F.transform(toks, lambda t: F.xxhash64(t)).alias("_th"))
    n = F.size("_th").cast("long")

    def _ones(i: int):
        mask = F.lit(1 << i) if i < 63 else F.lit(-(1 << 63))
        return F.size(F.filter(F.col("_th"),
                               lambda h: h.bitwiseAND(mask) != 0))

    bit_cols = []
    for i in range(bits):
        bit = F.lit(1 << i).cast("long") if i < 63 else F.lit(-(1 << 63)).cast("long")
        bit_cols.append(F.when(_ones(i) * 2 >= n, bit)
                        .otherwise(F.lit(0).cast("long")))
    sh = bit_cols[0]
    for c in bit_cols[1:]:
        sh = sh.bitwiseOR(c)
    return d.select(F.col(id_col), sh.alias("simhash"))


def simhash_near_dups(df: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", max_hamming: int = 3,
                      n_blocks: int = 4) -> DataFrame:
    """Near-dup pairs by SimHash: block the 64-bit hash into ``n_blocks``
    16-bit keys (pigeonhole: <=3 differing bits -> one block identical),
    bucket-join on each block, then exact Hamming filter."""
    sh = simhash(df, id_col, text_col)
    block_width = 64 // n_blocks
    blocks = F.explode(F.array(*[
        F.struct(F.lit(i).alias("blk"),
                 F.shiftrightunsigned(F.col("simhash"), i * block_width)
                  .bitwiseAND(F.lit((1 << block_width) - 1)).alias("key"))
        for i in range(n_blocks)])).alias("b")
    e = sh.select(id_col, "simhash", blocks).select(
        id_col, "simhash", F.col("b.blk"), F.col("b.key"))
    l = e.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("sh_a"),
                 "blk", "key")
    r = e.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("sh_b"),
                 "blk", "key")
    pairs = (l.join(r, ["blk", "key"]).filter(F.col("id_a") < F.col("id_b"))
              .select("id_a", "id_b", "sh_a", "sh_b").distinct())
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (pairs.withColumn("hamming", ham)
                 .filter(F.col("hamming") <= max_hamming)
                 .select("id_a", "id_b", "hamming"))


def embedding_near_dups(emb: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        min_cosine: float = 0.95,
                        n_lsh_planes: int = 8, seed: int = 42) -> DataFrame:
    """Embedding-cosine near-dups: sign-LSH bucket join then exact cosine.

    The random hyperplanes are derived from xxhash64 of (seed, plane, dim)
    so the plan is deterministic without shipping matrices."""
    from .similarity import cosine_expr, sign_lsh_bucket
    b = emb.withColumn("_bkt", sign_lsh_bucket(vec_col, n_lsh_planes, seed))
    l = b.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"), "_bkt")
    r = b.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"), "_bkt")
    pairs = (l.join(r, "_bkt").filter(F.col("id_a") < F.col("id_b")))
    cos = cosine_expr("v_a", "v_b")
    return (pairs.withColumn("cosine", cos)
                 .filter(F.col("cosine") >= min_cosine)
                 .select("id_a", "id_b", "cosine").distinct())
