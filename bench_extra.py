"""Per-query profiling harness for the optimization rounds (guide §1).

NOT the driver bench (bench.py is frozen): this tool decomposes each
headline query's wall time into

- build_s:   Python-side DataFrame construction (py4j round trips,
             analysis) — driver-only cost, invisible in stage metrics
- exec_s:    first noop-sink execution (optimization + jobs + stages)
- min_s:     min of N repeat executions of a freshly built plan (steady
             state; plan construction repeated so cached JVM state does
             not hide build cost)
- jobs:      Spark jobs launched by one execution (scheduling overhead
             proxy — every eager localCheckpoint/collect is one)

Usage:
    python bench_extra.py [query ...]          # default: all headline
    PROFILE_REPEATS=3 python bench_extra.py minhash_dups

Prints one JSON line per query plus a sorted summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
REPEATS = int(os.environ.get("PROFILE_REPEATS", "3"))

HEADLINE = [
    "pricing_summary", "duplicate_keys", "referential_orphans",
    "drift_psi_lang", "bounds_events", "token_counts", "quality_scores",
    "lang_id", "exact_dedup", "topk_cosine", "minhash_dups",
    "simhash_dups", "supplier_agg_rollup", "top_customers_window",
    "outlier_validate", "dedup_clusters", "stratified_sample",
    "vocab_top_terms", "repetition_scores", "extract_text",
    "canonical_urls", "decontamination", "pii_scrub", "hot_domains",
    "orphan_hosts", "url_dup_groups", "training_pipeline",
    "ann_topk_recall", "outlier_validate_root", "paragraph_dedup",
    "unigram_lm", "length_quantiles", "snapshot_diff",
    "winnowing_overlap", "winnowing", "dataset_card", "unigram_lm_head",
    "span_dedup", "dedup_clusters_collapsed", "gopher_rules",
    "resample_mix", "perplexity_buckets", "gopher_repetition",
    "bigram_lm", "curation_pipeline", "url_blocklist", "mix_weights",
    "semdedup", "bloom_decontaminate", "pack_sequences",
    "tfidf_top_terms", "novelty_scores",
]


def main() -> None:
    from bench import make_session
    import __spark_entry__ as entrymod

    names = sys.argv[1:] or HEADLINE
    qs = entrymod.queries()
    spark = make_session(CPUS)
    sc = spark.sparkContext
    # warm the Python worker pool (same as bench.py)
    (spark.range(CPUS * 4).repartition(CPUS)
          .mapInPandas(lambda it: it, "id long")
          .write.format("noop").mode("overwrite").save())

    rows = []
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        build_s = time.time() - t0
        j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        exec_s = time.time() - t0
        j1 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        best = exec_s
        for _ in range(max(0, REPEATS - 1)):
            t0 = time.time()
            df2 = qs[name](spark, SF_DIR)
            df2.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        rows.append({"query": name, "build_s": round(build_s, 3),
                     "exec_s": round(exec_s, 3),
                     "min_s": round(best, 3), "jobs": j1 - j0})
        print(json.dumps(rows[-1]), flush=True)
        sc.setJobDescription(None)
    rows.sort(key=lambda r: -(r["build_s"] + r["min_s"]))
    print("== total build+min (desc) ==")
    for r in rows:
        print(f"{r['query']:28s} build={r['build_s']:6.2f} "
              f"first={r['exec_s']:6.2f} min={r['min_s']:6.2f} "
              f"jobs={r['jobs']}")
    tot_b = sum(r["build_s"] for r in rows)
    tot_m = sum(r["min_s"] for r in rows)
    print(f"TOTAL build={tot_b:.1f}s min_exec={tot_m:.1f}s")
    spark.stop()


if __name__ == "__main__":
    main()
