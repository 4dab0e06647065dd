"""Benchmark harness (driver contract + BASELINE.md two-parallelism rule).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], then re-runs the
validate-throughput job at local[8] on the same input to evidence the
north rule's two-cluster-size scaling criterion (no real cluster in this
sandbox; BASELINE.md documents the stand-in).  Prints ONE JSON line.

The validate job measures the scale path only: the model is fitted once
(fit time reported separately) and the timed section is scan -> pushed
prefilter -> Arrow mapInPandas routing -> count, over a deterministic
scale_up of the documents table (~2M rows).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
TARGET_DOCS = int(os.environ.get("BENCH_TARGET_DOCS", "20000000"))
# the gated N->4N pair runs a 3x longer job: at 20M docs the local[32]
# run is ~3s and wave/session noise dominates the measurement; at 60M
# the same plan reads 0.73 instead of 0.60 (round-3 ladder experiments)
SCALE_DOCS = int(os.environ.get("BENCH_SCALE_DOCS", "60000000"))
LOW_PAR = int(os.environ.get("BENCH_LOW_PAR", "8"))


def _sf_number(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def make_session(par: int, aqe: bool = True):
    """Bench session with a PINNED, pre-touched heap.

    With the default (-Xmx only) JVM sizing, G1 uncommits heap regions
    after each GC cycle and the next run re-faults ~1M pages: 30-40% of
    every core goes to kernel page zeroing, run times swing 4s-90s, and
    adding threads makes it WORSE (zone-lock contention) — this was the
    round-1 "local[32] slower than local[16]" collapse (BENCH_r01:
    8->32 efficiency 0.235).  -Xms == -Xmx + AlwaysPreTouch commits and
    zeroes the heap once at JVM start; run times stabilize (3.6-4.2s at
    local[16], ~0% system time) and 8->32 scales at ~0.97.  Same fix a
    real cluster applies via spark.executor.memory (Xms==Xmx is the
    default for executors launched by YARN/k8s)."""
    from outliertree_spark.session import get_spark
    mem = os.environ.get("SPARK_DRIVER_MEM", "16g")
    return get_spark(app=f"bench[{par}]", master=f"local[{par}]",
                     shuffle_partitions=par,
                     extra_conf={"spark.ui.showConsoleProgress": "false",
                                 "spark.driver.memory": mem,
                                 # AQE off for the scaling-ladder sessions:
                                 # the validate job is shuffle-free with a
                                 # static plan, and AQE's re-plan barrier
                                 # adds 0.5-2s of jitter to a 2.5s job
                                 # (headline-query sessions keep it on)
                                 "spark.sql.adaptive.enabled":
                                     str(aqe).lower(),
                                 # fixed split size at every parallelism
                                 # level: by default Spark sizes splits as
                                 # totalSize/parallelism, so local[8] got
                                 # 103MB splits (heavy per-task decode
                                 # footprint, GC-noisy) while local[32]
                                 # got 26MB — different jobs, not a
                                 # scaling comparison.  32m bin-packs ~3
                                 # of the 11MB files per task (~48 tasks):
                                 # measured sweep (round 2) vs 16m/8m —
                                 # 16m 3.47s, 8m 3.57s, 32m 2.58s at
                                 # local[32]; per-task Arrow/python setup
                                 # dominates below ~30MB of input per task
                                 "spark.sql.files.maxPartitionBytes": "32m",
                                 "spark.sql.files.openCostInBytes": "1m",
                                 # bigger Arrow batches = fewer JVM<->py
                                 # transitions (measured 3.47->3.12s at
                                 # local[32] on its own); ParallelGC beats
                                 # G1 on this short throughput-bound job
                                 # (3.47->2.96s); combined with 32m splits:
                                 # 2.55s / 7.8M docs/s at local[32]
                                 "spark.sql.execution.arrow.maxRecordsPerBatch":
                                     "65536",
                                 "spark.driver.extraJavaOptions":
                                     f"-Xms{mem} -XX:+AlwaysPreTouch "
                                     f"-XX:+UseParallelGC"})


def membw_probe(procs: list[int], mb: int = 64, iters: int = 20) -> dict:
    """Aggregate memory read bandwidth (GB/s) at each process count.

    The validate job is a streaming decode (parquet -> strings -> filter);
    on one box its N->4N scaling is bounded by how the box's memory
    bandwidth scales with thread count, NOT by the plan (which is
    shuffle-free).  Printing the measured bandwidth curve next to the job
    curve makes a sub-1.0 efficiency self-explaining: on a real cluster
    each of the 4N executors brings its own memory controllers."""
    import multiprocessing as mp

    out = {}
    ctx = mp.get_context("fork")
    for n in procs:
        with ctx.Pool(n) as p:
            out[n] = round(sum(p.map(_stream_worker, [(mb, iters)] * n)), 1)
    return out


def _stream_worker(args):
    import numpy as np
    mb, iters = args
    buf = np.frombuffer(np.random.RandomState(0).bytes(mb * 1024 * 1024),
                        dtype=np.uint8).copy()
    t0 = time.time()
    s = 0
    for _ in range(iters):
        s += int(buf.sum())
    return iters * len(buf) / (time.time() - t0) / 1e9


def build_validator(spark, sf_dir):
    from pyspark.sql import functions as F
    from outliertree_spark import SparkOutlierTree, ValidationConfig
    from outliertree_spark.sources.docs import load_documents, to_north_shape

    base = to_north_shape(load_documents(spark, sf_dir), plant=True)
    feat = (base.withColumn("text_len", F.length("text").cast("double"))
                .select("doc_id", "text_len", "lang", "source", "warc_ts"))
    t0 = time.time()
    eng = SparkOutlierTree(ValidationConfig())
    eng.fit(feat, id_cols=["doc_id"])
    fit_sec = time.time() - t0
    return eng, fit_sec


def materialize_scaled_docs(spark, sf_dir, target_rows) -> tuple[str, int]:
    """Write the scaled documents table to parquet ONCE (bench setup).

    The timed job then measures the realistic shape — parquet scan
    (including the text bytes), derived text_len, pushed prefilter, Arrow
    routing — with the synthetic-generation cost out of the timed path."""
    import tempfile
    from pyspark.sql import functions as F
    from outliertree_spark.sources.docs import load_documents, scale_up, to_north_shape

    # FIXED file count, independent of the writing session's parallelism.
    # Parquet scan concurrency is row-group-bound: Spark makes 16MB splits
    # but only the split containing a row-group START does any work, so a
    # 16-file/16-row-group table caps every session at 16 effective tasks
    # and local[32] can never beat local[16] (measured: 4.43s vs 4.50s,
    # identical busy core-seconds).  128 files = 4+ task waves at 32
    # cores.  The 100TB lesson is the same one: size files/row groups so
    # the scan yields several waves of tasks per executor core.
    n_files = int(os.environ.get("BENCH_INPUT_FILES", "128"))
    path = os.path.join(tempfile.gettempdir(),
                        f"bench_docs_{_sf_number(sf_dir)}_{target_rows}"
                        f"_{n_files}f.parquet")
    if not os.path.exists(path):
        docs = load_documents(spark, sf_dir)
        n = docs.count()
        factor = max(1, target_rows // max(n, 1))
        scaled = scale_up(docs.repartition(n_files), factor)
        base = to_north_shape(scaled, plant=True)
        (base.select("doc_id", "text", "lang", "source", "warc_ts")
             .repartition(n_files)
             .write.mode("overwrite").parquet(path))
    return path


def scaled_feature_table(spark, sf_dir, target_rows):
    from pyspark.sql import functions as F
    path = materialize_scaled_docs(spark, sf_dir, target_rows)
    raw = spark.read.parquet(path)
    feat = (raw.withColumn("text_len", F.length("text").cast("double"))
               .select("doc_id", "text_len", "lang", "source", "warc_ts"))
    return feat, raw


def _cpu_jiffies():
    with open("/proc/stat") as f:
        return list(map(int, f.readline().split()[1:]))


def run_validate_throughput(spark, sf_dir, eng, warmup: bool = True,
                            n_runs: int = 3,
                            target_docs: int | None = None,
                            use_score: bool = False):
    """Steady-state wall time: two warmups (JIT/codegen + OS page cache --
    one pass is not always enough to fully warm cold cloud disks), then
    min of ``n_runs`` timed executions of the same job.

    Also measures busy CORE-SECONDS (non-idle /proc/stat jiffies) around
    the best run: equal CPU work at every parallelism level proves the
    plan itself scales (no per-thread slowdown, no extra work); any
    wall-clock efficiency below 1.0 is then scheduler wave quantization
    on a short job plus host noise — which a real 4N-executor cluster
    does not share.

    ``use_score`` runs the pure-Catalyst ``engine.score()`` path instead
    of the Arrow ``predict`` path: a ladder with ZERO Python workers in
    the plan, isolating whether the Arrow/Python layer limits scaling
    (round-3 finding: it does not — the JVM path scales the same or
    slightly worse, so the residual gap is the box, not the workers)."""
    feat, raw = scaled_feature_table(spark, sf_dir,
                                     target_docs or TARGET_DOCS)
    v = (eng.score(feat, id_cols=["doc_id"]) if use_score
         else eng.predict(feat, id_cols=["doc_id"]))
    if warmup:
        v.count()
        v.count()
    n_docs = raw.count()
    best = float("inf")
    best_busy = 0.0
    n_viols = 0
    runs = []
    for _ in range(max(1, n_runs)):
        s0 = _cpu_jiffies()
        t0 = time.time()
        n_viols = v.count()
        dt = time.time() - t0
        s1 = _cpu_jiffies()
        d = [b - a for a, b in zip(s0, s1)]
        busy = (sum(d) - d[3] - d[4]) / 100.0  # minus idle+iowait
        runs.append(dt)
        if dt < best:
            best, best_busy = dt, busy
    print(f"runs@{spark.sparkContext.master}: "
          f"{['%.2f' % r for r in runs]} busy_core_s={best_busy:.1f}",
          file=sys.stderr)
    return n_docs, n_viols, best, best_busy


def materialize_pruned_docs(spark, target_rows) -> str:
    """A wider documents table that STORES text_len next to text — the
    layout a real 100TB pipeline uses so validation never re-decodes
    the raw bytes it does not need.  The validate scan then prunes the
    text column entirely (ReadSchema without `text`): per-doc CPU halves
    and scanned bytes drop ~10x vs deriving text_len from text."""
    import tempfile
    from pyspark.sql import functions as F
    base_path = materialize_scaled_docs(spark, SF_DIR, TARGET_DOCS)
    factor = max(1, target_rows // TARGET_DOCS)
    # the cache name MUST carry every input that determines the content:
    # the SF (an sf0.01 run would otherwise poison the sf0.1 cache —
    # observed: a killed sf0.01 run deleted the sf0.1 pruned table
    # mid-overwrite, forcing a 200M-doc rebuild) AND the base-table size
    # (factor and doc_id layout derive from TARGET_DOCS, so a run with a
    # different BENCH_TARGET_DOCS must not silently reuse stale data)
    path = os.path.join(tempfile.gettempdir(),
                        f"bench_docs_pruned_{_sf_number(SF_DIR)}"
                        f"_{TARGET_DOCS}b_{target_rows}.parquet")
    if not os.path.exists(path):
        raw = spark.read.parquet(base_path)
        w = raw.withColumn("text_len", F.length("text").cast("double"))
        if factor > 1:
            w = (w.withColumn("_r", F.explode(
                     F.sequence(F.lit(0), F.lit(factor - 1))))
                  .withColumn("doc_id",
                              F.col("doc_id") * factor + F.col("_r"))
                  .drop("_r"))
        (w.select("doc_id", "text", "text_len", "lang", "source", "warc_ts")
          .repartition(128).write.mode("overwrite").parquet(path))
    return path


def run_pruned_ladder(eng, pruned_docs: int) -> dict:
    """Column-pruned validate ladder at LOW_PAR and CPUS: scan only
    (doc_id, text_len, lang, source, warc_ts) from the stored-text_len
    table.  This is the at-scale scan shape; reported next to the
    text-decoding ladder so the bandwidth-vs-plan split is explicit."""
    s = make_session(LOW_PAR)
    path = materialize_pruned_docs(s, pruned_docs)
    s.stop()
    # interleave the two levels and keep per-level minima, same as the
    # main ladder: host-noise waves on this VM can otherwise hit one
    # level only and fake any efficiency from 0.5 to 1.6 (both
    # observed).  Round 4: the ladder is gated at 200M docs so the
    # local[CPUS] leg is a >=8s steady-state job (the round-3 0.683
    # reading came off a 1.57s job — exactly the short-job noise
    # BASELINE.md documents); with long jobs 2 interleave rounds span
    # the minute-scale host waves.
    best = {LOW_PAR: float("inf"), CPUS: float("inf")}
    for _ in range(2):
        for par in (LOW_PAR, CPUS):
            spark = make_session(par, aqe=False)
            feat = (spark.read.parquet(path)
                    .select("doc_id", "text_len", "lang", "source", "warc_ts"))
            v = eng.predict(feat, id_cols=["doc_id"])
            v.count()
            v.count()
            for _r in range(2):
                t0 = time.time()
                v.count()
                best[par] = min(best[par], time.time() - t0)
            spark.stop()
    out = {}
    for par in (LOW_PAR, CPUS):
        out[f"local[{par}]"] = round(pruned_docs / best[par], 1)
        print(f"pruned ladder local[{par}]: {best[par]:.2f}s",
              file=sys.stderr)
    lo, hi = out[f"local[{LOW_PAR}]"], out[f"local[{CPUS}]"]
    return {"pruned_docs": pruned_docs,
            "pruned_throughput_docs_per_sec": out,
            "pruned_scaling_efficiency":
                round((hi / lo) / (CPUS / LOW_PAR), 3)}


def ann_path_timings(spark, sf_dir) -> dict[str, float]:
    """Per-path seconds for the ann_topk_recall fixture: the query's
    cost is dominated by its deliberate brute-force exactness baseline
    (fixture-only — never the scale path), so the suite number alone
    cannot show whether the ANN paths themselves regressed.  Times each
    path alone to a noop sink, warm (the headline loop has already run
    the composed query once)."""
    import __spark_entry__ as entrymod  # noqa: F401  (sys.path side effect)
    from pyspark.sql import functions as F
    from outliertree_spark.operators.ivf import ivf_topk
    from outliertree_spark.operators.similarity import (brute_force_topk,
                                                        lsh_topk)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    as_double = F.transform("embedding", lambda x: x.cast("double"))
    embd = emb.select("vec_id", as_double.alias("embedding"))
    q = (embd.filter(F.col("vec_id") < 20)
             .select(F.col("vec_id").alias("query_id"), "embedding"))
    paths = {
        "brute": lambda: brute_force_topk(embd, q, k=10),
        "lsh": lambda: lsh_topk(embd, q, k=10, n_tables=16, n_planes=4),
        "ivf": lambda: ivf_topk(embd, q, k=10, k_cells=32, nprobe=8),
    }
    out = {}
    for name, build in paths.items():
        t0 = time.time()
        build().write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def run_headline_queries(spark, sf_dir) -> dict[str, float]:
    import __spark_entry__ as entrymod
    names = ["pricing_summary", "duplicate_keys", "referential_orphans",
             "drift_psi_lang", "bounds_events", "token_counts",
             "quality_scores", "lang_id", "exact_dedup", "topk_cosine",
             "minhash_dups", "simhash_dups", "supplier_agg_rollup",
             "top_customers_window", "outlier_validate",
             "dedup_clusters", "stratified_sample", "vocab_top_terms",
             "repetition_scores", "extract_text", "canonical_urls",
             "decontamination", "pii_scrub", "hot_domains",
             "orphan_hosts", "url_dup_groups", "training_pipeline",
             "ann_topk_recall", "outlier_validate_root",
             "paragraph_dedup", "unigram_lm", "length_quantiles",
             "snapshot_diff", "winnowing_overlap", "winnowing",
             "dataset_card", "unigram_lm_head", "span_dedup",
             "dedup_clusters_collapsed", "gopher_rules", "resample_mix",
             "perplexity_buckets", "gopher_repetition", "bigram_lm",
             "curation_pipeline", "url_blocklist", "mix_weights",
             "semdedup", "bloom_decontaminate", "pack_sequences",
             "tfidf_top_terms", "novelty_scores"]
    qs = entrymod.queries()
    out = {}
    for name in names:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        out[name] = round(time.time() - t0, 3)
    return out


def run_ladder(model_path, docs_target: int, levels: list[int],
               rounds: int = 2, n_runs: int = 2, warmup: bool = True,
               use_score: bool = False) -> dict:
    """Interleaved per-level minima ladder over the SAME materialized
    table.  This sandbox VM's host capacity fluctuates (CPU steal
    spikes), so a single A-then-B comparison is unreliable: interleave
    the levels over ``rounds`` alternating sessions and take per-level
    minima — host noise then inflates both sides equally or not at
    all."""
    from outliertree_spark import SparkOutlierTree
    best = {p: float("inf") for p in levels}
    busy = {p: 0.0 for p in levels}
    viols = {}
    n_docs = 0
    for _ in range(rounds):
        for par in levels:
            spark = make_session(par, aqe=False)
            eng = SparkOutlierTree.load(model_path)
            nd, nv, sec, bz = run_validate_throughput(
                spark, SF_DIR, eng, warmup=warmup, n_runs=n_runs,
                target_docs=docs_target, use_score=use_score)
            n_docs, viols[par] = nd, nv
            if sec < best[par]:
                best[par], busy[par] = sec, bz
            spark.stop()
    lo, hi = levels[0], levels[-1]
    return {
        "docs": n_docs,
        "sec": best,
        "busy": busy,
        "viols": viols,
        "eff": round((best[lo] / best[hi]) / (hi / lo), 3)
        if best[lo] < float("inf") else None,
    }


def main() -> None:
    import tempfile
    from outliertree_spark import SparkOutlierTree

    model_path = os.path.join(tempfile.gettempdir(), "bench_model.json")
    spark = make_session(LOW_PAR)
    eng, fit_sec = build_validator(spark, SF_DIR)
    eng.save(model_path)
    spark.stop()

    rounds = int(os.environ.get("BENCH_ROUNDS", "2"))
    # Gated N->4N pair (LOW_PAR -> CPUS) on the LONG job: at 20M docs
    # the local[32] run is ~3s and wave quantization + session noise
    # dominate; 60M is steady-state (round-3 split-size sweep confirmed
    # 32m splits optimal: finer tasks LOSE to per-task Arrow setup —
    # 32m 0.73 / 16m 0.62 / 8m 0.55 on identical input).
    # one extra interleave round on the GATED pair: this host's capacity
    # swings on minute scale (membw probe has read 15-22 GB/s at 8 procs
    # across windows), and per-level minima only help if at least one
    # round lands in a clean window
    gated = run_ladder(model_path, SCALE_DOCS, [LOW_PAR, CPUS],
                       rounds=rounds + 1)
    # supporting 4->16 pair at the 20M size (short job is fine at low
    # parallelism: 15s+ runs)
    support = run_ladder(model_path, TARGET_DOCS, [4, 16], rounds=rounds)
    # diagnostic: pure-JVM score() ladder (no Python workers in the
    # plan).  If this scaled well while Arrow did not, the worker layer
    # would be the bottleneck; measured round 3 it scales the SAME or
    # worse (0.56 vs 0.59 at 20M) — the Arrow layer is exonerated and
    # the residual gap is the box (membw probe + busy-core equality).
    jvm = run_ladder(model_path, TARGET_DOCS, [LOW_PAR, CPUS],
                     rounds=1, use_score=True)

    # fixed-cost host probe BEFORE the query suite: the round-4 artifact
    # showed ~12 untouched queries drifting +20-30% in lockstep with the
    # host's memory bandwidth — bracketing the suite with the same probe
    # lets a reader separate host noise from plan regressions in one
    # read (queries run at CPUS, so probe at CPUS)
    bw_before = membw_probe([CPUS])[CPUS]

    spark = make_session(CPUS)
    # warm the Python worker pool before timing: the FIRST Arrow
    # (mapInPandas/pandas_udf) query in a fresh session otherwise
    # absorbs ~5-7s of worker spin-up that belongs to the session, not
    # the plan (measured: gopher_repetition 8.2s cold-first vs 1.38s
    # warm at sf0.1/local[32])
    (spark.range(CPUS * 4).repartition(CPUS)
          .mapInPandas(lambda it: it, "id long")
          .write.format("noop").mode("overwrite").save())
    queries = run_headline_queries(spark, SF_DIR)
    ann_paths = ann_path_timings(spark, SF_DIR)
    # headline validate timing at CPUS on the 20M table (same number the
    # suite has always reported)
    eng = SparkOutlierTree.load(model_path)
    _, nv20, sec20, _ = run_validate_throughput(
        spark, SF_DIR, eng, warmup=True, n_runs=2,
        target_docs=TARGET_DOCS)
    spark.stop()

    # single-box ceiling evidence for the N->4N criterion (see membw_probe)
    bw = membw_probe([LOW_PAR, CPUS])
    bw_eff = (bw[CPUS] / bw[LOW_PAR]) / (CPUS / LOW_PAR)

    # normalize each query to a reference host speed: sec * (measured
    # gbps / reference gbps) estimates what the query would have taken
    # in the reference window.  The reference constant is the CPUS-proc
    # aggregate bandwidth recorded in BASELINE.md's clean-window entry;
    # override with BENCH_PROBE_REF_GBPS when re-baselining.
    probe_gbps = round((bw_before + bw[CPUS]) / 2.0, 1)
    ref_gbps = float(os.environ.get("BENCH_PROBE_REF_GBPS", "87.5"))
    norm = round(probe_gbps / ref_gbps, 3)
    queries_norm = {k: round(v * norm, 3) for k, v in queries.items()}

    pruned = run_pruned_ladder(
        SparkOutlierTree.load(model_path),
        int(os.environ.get("BENCH_PRUNED_DOCS", "200000000")))

    # the north rule gates N->4N >= 0.8: headline the WORST measured
    # N->4N pair, never the favorable one
    pairs = {f"{LOW_PAR}->{CPUS}": gated["eff"], "4->16": support["eff"]}
    headline_eff = min(v for v in pairs.values() if v is not None)
    thru = {f"local[{p}]": round(gated["docs"] / s, 1)
            for p, s in gated["sec"].items()}
    thru.update({f"local[{p}]": round(support["docs"] / s, 1)
                 for p, s in support["sec"].items()})
    busy = {f"local[{p}]": round(b, 1) for p, b in
            {**support["busy"], **gated["busy"]}.items()}
    agree = (len(set(gated["viols"].values())) == 1
             and len(set(support["viols"].values())) == 1)
    total = round(sum(queries.values()) + sec20, 3)
    result = {
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": {**queries, "validate_20M_docs": round(sec20, 3)},
        # host-speed-normalized twin of `queries` (see probe comments):
        # raw/normalized diverging together across the suite = host
        # noise; one query moving alone = a plan change
        "queries_normalized_to_ref_host": queries_norm,
        "host_probe": {"gbps_before_suite": bw_before,
                       "gbps_after_suite": bw[CPUS],
                       "gbps_used": probe_gbps,
                       "ref_gbps": ref_gbps,
                       "normalization_factor": norm},
        # ann_topk_recall cost split: brute = deliberate exactness
        # baseline (fixture-only), lsh/ivf = the paths that must scale
        "ann_topk_paths_sec": ann_paths,
        "sf": _sf_number(SF_DIR),
        "validate_docs": gated["docs"],
        "validate_violations": gated["viols"].get(CPUS, 0),
        "fit_sec": round(fit_sec, 3),
        # rates are comparable across levels; the 8/32 pair runs the 60M
        # table (steady state), the 4/16 pair the 20M table — see
        # ladder_docs_by_level for the basis of each level
        "throughput_docs_per_sec": thru,
        "ladder_docs_by_level": {
            **{f"local[{p}]": support["docs"] for p in support["sec"]},
            **{f"local[{p}]": gated["docs"] for p in gated["sec"]}},
        "scaling_efficiency": headline_eff,
        "scaling_efficiency_by_pair": pairs,
        # pure-JVM (score(), zero Python workers) diagnostic ladder:
        # scales the same as the Arrow path => the Python worker layer
        # is not what bounds N->4N on this box
        "jvm_ladder": {
            "docs": jvm["docs"],
            "throughput_docs_per_sec": {
                f"local[{p}]": round(jvm["docs"] / s, 1)
                for p, s in jvm["sec"].items()},
            "eff": jvm["eff"]},
        # how the BOX's memory bandwidth itself scales over the same
        # thread counts: the shuffle-free validate job cannot scale
        # better than this on one machine (each of 4N real executors
        # would bring its own memory controllers)
        "membw_gbps_by_procs": {f"{p}": v for p, v in bw.items()},
        "membw_scaling_efficiency": round(bw_eff, 3),
        # equal busy core-seconds across levels = the plan does the same
        # total CPU work at every parallelism (no per-thread slowdown);
        # sub-1.0 wall efficiency is wave quantization on a short job
        "busy_core_seconds_by_level": busy,
        "parallelism": {"low": LOW_PAR, "high": CPUS},
        "violations_agree_across_parallelism": agree,
        # at-scale scan shape: text_len stored, text column pruned
        **pruned,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
