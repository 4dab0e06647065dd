"""Interleaved A/B: bigram_lm_scores_fp current vs token-array-ckpt variant.

Variant B lazily checkpoints the token-array table (d1) and builds the
pair checkpoint FROM it, so the split+filter chain evaluates once
instead of twice (pair-ckpt write + unigram vocab read both re-run it
today).  Run: python tools/ab_bigram.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def variant_b(df, id_col="doc_id", text_col="text", head_size=20, alpha=0.4):
    from outliertree_spark.operators.dedup import _spread
    c = F.col(text_col)
    toks = F.filter(F.split(F.lower(F.trim(c)), r"\s+"),
                    lambda t: F.length(t) > 0)
    d1 = (_spread(df).select(F.col(id_col), toks.alias("_t"))
          .localCheckpoint(eager=False))
    t = F.col("_t")
    n = F.size(t)
    pairs = F.when(n >= 2, F.filter(
        F.zip_with(t, F.slice(t, 2, n - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2"))),
        lambda p: p["w2"].isNotNull())
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    d2 = d1.select(F.col(id_col), pairs.alias("_bg")) \
           .localCheckpoint(eager=False)
    bg = (d2.select(F.col(id_col), F.explode("_bg").alias("_p"))
            .select(F.col(id_col), F.col("_p.w1").alias("w1"),
                    F.col("_p.w2").alias("w2")))
    tokrows = d1.select(F.col(id_col), F.explode("_t").alias("term"))
    uni = tokrows.groupBy("term").agg(F.count(F.lit(1)).alias("_cu"))
    total = uni.agg(F.sum("_cu").alias("_total"))
    big = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("_cb"))
    if head_size is not None:
        big = (big.orderBy(F.desc("_cb"), F.asc("w1"), F.asc("w2"))
                  .limit(head_size))
        uni = (uni.orderBy(F.desc("_cu"), F.asc("term"))
                  .limit(head_size))
    j = (bg.join(F.broadcast(big), ["w1", "w2"], "left")
           .join(F.broadcast(uni.select(F.col("term").alias("w1"),
                                        F.col("_cu").alias("_cu1"))),
                 "w1", "left")
           .join(F.broadcast(uni.select(F.col("term").alias("w2"),
                                        F.col("_cu").alias("_cu2"))),
                 "w2", "left")
           .crossJoin(F.broadcast(total)))
    tot = F.col("_total").cast("double")
    lp = F.when(F.col("_cb").isNotNull() & F.col("_cu1").isNotNull(),
                F.log(F.col("_cb").cast("double")
                      / F.col("_cu1").cast("double"))) \
          .otherwise(F.log(
              (F.lit(alpha) * F.coalesce(F.col("_cu2").cast("double"),
                                         F.lit(0.5))) / tot))
    fp = F.round(lp * F.lit(1000000.0)).cast("long")
    per = (j.groupBy(id_col)
            .agg(F.count(F.lit(1)).alias("n_trans"),
                 F.sum(fp).alias("sum_lp_fp")))
    mean_lp = (F.col("sum_lp_fp").cast("double")
               / F.col("n_trans").cast("double") / F.lit(1000000.0))
    return per.withColumn("mean_lp", mean_lp)


def main():
    from bench import make_session
    from outliertree_spark.operators.text import bigram_lm_scores_fp
    spark = make_session(CPUS)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))

    def run(fn):
        t0 = time.time()
        out = fn(docs, head_size=20)
        out = out.select("doc_id", "n_trans", "sum_lp_fp",
                         F.round("mean_lp", 6).alias("mean_lp"))
        out.write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # equality check once
    a = bigram_lm_scores_fp(docs, head_size=20).orderBy("doc_id").collect()
    b = variant_b(docs, head_size=20).orderBy("doc_id").collect()
    assert a == b, "variant output differs!"
    print("outputs identical:", len(a), "rows")

    times_a, times_b = [], []
    for i in range(6):
        times_a.append(run(bigram_lm_scores_fp))
        times_b.append(run(variant_b))
    print("A current :", [round(x, 3) for x in times_a], "min", round(min(times_a), 3))
    print("B tok-ckpt:", [round(x, 3) for x in times_b], "min", round(min(times_b), 3))


if __name__ == "__main__":
    main()
