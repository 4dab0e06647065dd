"""Connected components over near-duplicate pair lists.

Dedup pipelines emit PAIRS (minhash/simhash/embedding candidates after
exact verification) but act on GROUPS: every document in a component of
the duplicate graph keeps/drops together, with one canonical survivor.
The reference has no graph operator (it is a single-table detector), so
this is a north-rule/pipeline addition, not a port.

Algorithm: iterative min-label propagation (the standard Spark CC
formulation, cf. the large-star/small-star family of Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14):

    label(v) := v
    repeat: label(v) := min(label(v), min over neighbors' labels)

Each round is one shuffle-join (edges x labels) + one hash aggregate;
convergence takes O(diameter) rounds.  Duplicate-pair graphs are
near-star-shaped (a cluster of near-identical docs is a quasi-clique),
so 2-4 rounds are typical.  Scale notes:

- lineage is cut per round with ``localCheckpoint`` — without it the
  iterated join plan grows exponentially and the driver dies at
  optimizer time long before the executors break a sweat;
- convergence is detected by counting CHANGED labels (one cheap action
  per round on label-sized data, never on the edge set);
- the edge list is symmetrized once; each round shuffles only
  (edge endpoints x current labels), both keyed on vertex id, so AQE
  coalesces the post-join exchange;
- a ``max_iter`` guard bounds pathological chain graphs (a chain of
  length 2^max_iter would not converge; duplicate graphs never look
  like that, and the guard raises rather than silently truncating).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b", max_iter: int = 25,
                         local_edges_cap: int = 100_000) -> DataFrame:
    """(id, component) for every vertex in ``edges``; ``component`` is
    the smallest vertex id reachable from ``id``.

    ``edges`` is an undirected pair list (each pair once, either
    orientation); rows with a NULL endpoint are dropped up front (both
    paths — the distributed join would silently drop them anyway, and
    the fast path must agree).  Isolated vertices are the caller's
    concern — join the result back to the full table with a coalesce
    to self.

    ``local_edges_cap``: BOUNDED small-graph fast path.  The symmetrized
    edge table is materialized first either way (the loop would need it);
    if it holds at most this many rows (probed with a LIMIT cap+1, so
    the driver never pulls more than cap+1 narrow rows), components are
    solved in one union-find pass on the driver and returned as a local
    relation — the verified near-duplicate graph after Jaccard
    thresholding is tiny even when the corpus is not, and each avoided
    propagation round costs a checkpoint job plus a convergence count.
    This mirrors AQE's localize-small-shuffles behavior, with the same
    discipline as the other bounded driver materializations (IVF's 20k
    sample, the boilerplate top-K): an explicit cap, a distributed
    fallback above it, identical output either side (equality is pinned
    in tests/test_pipeline_ops2.py).  Memory bound: cap edge rows +
    up to 2*cap vertex labels of plain Python ints/strings.  Pass 0 to
    force the distributed loop.  The fast-path result carries an
    explicit broadcast hint (safe: it is bounded at 2*cap narrow rows),
    so downstream joins against it hash-join without shuffling the
    other side even under the static planner.
    Measured (round 5, sf0.1 dedup_clusters end-to-end, interleaved
    minima of 4): 2.46s distributed loop -> 2.06s fast path.

    Round 6: the fast path probes the RAW pair list (CollectLimit over
    the null-filtered pair projection) and symmetrizes/dedups
    driver-side in the union-find itself, instead of materializing the
    symmetrized-distinct table first: the old shape ran
    union(select, select) over the unverified pairs plan, which
    evaluates that subplan TWICE inside the eager checkpoint job, plus
    a distinct exchange and the checkpoint write, before the probe
    could even run.  The pair projection is lazily checkpointed BEFORE
    the probe, so partitions the probe computes are retained and the
    distributed fallback (probe overflow) reads the same
    materialization instead of re-running the caller's — possibly
    expensive — verify subplan: measured on a 20x duplicate-heavy
    fixture whose ~950k verified pairs overflow the cap, the un-ckpt'd
    probe variant cost ~+20% end-to-end (probe evaluation thrown away),
    while on the under-cap sf0.1 graph the ckpt adds only its toRdd
    build cost.  Same cap discipline: the driver never holds more than
    cap+1 narrow pair rows (the symmetrized parent dict is bounded by
    2 entries per collected pair, same bound as before)."""
    pairs = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
                  .where(F.col("u").isNotNull() & F.col("v").isNotNull())
                  .localCheckpoint(eager=False))
    if local_edges_cap:
        head = pairs.limit(local_edges_cap + 1).collect()
        if len(head) <= local_edges_cap:
            return _local_components(edges.sparkSession, head, pairs.schema)
    e = (pairs.union(pairs.select(F.col("v").alias("u"),
                                  F.col("u").alias("v")))
              .distinct()
              .localCheckpoint(eager=True))
    labels = (e.select(F.col("u").alias("id"))
               .distinct()
               .withColumn("component", F.col("id")))
    for it in range(max_iter):
        # candidate labels flowing across edges: u receives v's label
        nbr = (e.join(labels.withColumnRenamed("id", "v"), "v")
                .select(F.col("u").alias("id"), "component"))
        # the convergence flag is computed INSIDE the round plan (each
        # vertex carries its previous label through the aggregate), so
        # the per-round checkpoint job materializes labels AND the
        # changed flag together — the old shape ran a separate
        # new-vs-old join job per round (measured at sf0.1: CC portion
        # 0.77s -> 0.65s, faster in every interleaved round)
        new_labels = (labels.withColumn("_old", F.col("component"))
                            .unionByName(nbr.withColumn(
                                "_old", F.lit(None).cast("long")))
                            .groupBy("id")
                            .agg(F.min("component").alias("component"),
                                 F.min("_old").alias("_old"))
                            .withColumn("_chg",
                                        F.col("component") != F.col("_old"))
                            .localCheckpoint(eager=True))
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.select("id", "component")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds; "
        "the input graph has a longer path structure than any "
        "duplicate-pair graph should — raise max_iter explicitly")


def _local_components(spark, edge_rows, edge_schema) -> DataFrame:
    """Driver-side union-find over a bounded symmetrized edge list.

    Union-by-min (the larger root is attached under the smaller) plus
    path compression: the root of every tree IS the component's minimum
    id, matching the distributed min-label fixpoint exactly."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for row in edge_rows:
        u, v = row[0], row[1]
        if u not in parent:
            parent[u] = u
        if v not in parent:
            parent[v] = v
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    out = [(v, find(v)) for v in parent]
    vt = edge_schema["u"].dataType
    schema = T.StructType([T.StructField("id", vt, False),
                           T.StructField("component", vt, False)])
    # Arrow-backed local relation (localrel.local_df): the plain
    # createDataFrame path pickles the rows into a Python RDD whose
    # every execution runs the non-Arrow Python worker lane — the first
    # such execution in a session paid ~1.7s of lane spin-up (measured:
    # dedup_clusters noop exec1 2.04s vs exec2 0.37s at sf0.1).  As a
    # LocalTableScan the result is pure JVM at execution time.
    # explicit hint: it is bounded and tiny by construction, so force
    # the broadcast side once for every downstream join.  (Consumers
    # that never join it get a benign one-line HintErrorLogger WARN
    # about the unused hint.)
    from ..localrel import local_df
    return F.broadcast(local_df(spark, out, schema))


def near_dup_components(docs: DataFrame, id_col: str = "doc_id",
                        text_col: str = "text", k_shingle: int = 3,
                        jaccard_threshold: float = 0.7,
                        collapse_exact: bool = False,
                        n_hashes: int = 64, n_bands: int = 16,
                        seed: int = 42,
                        bucket_cap: int = 10000) -> DataFrame:
    """(id, component) over the verified near-duplicate graph: MinHash
    LSH candidates -> exact shingle-Jaccard >= threshold -> min-label
    connected components.  Documents with no qualifying edge are absent
    (isolated vertices are the caller's concern, as in
    :func:`connected_components`).

    ``collapse_exact=True`` is the duplicate-heavy-corpus scale path:
    byte-identical documents are collapsed to one representative (the
    min id per ``md5(text)`` group) BEFORE the expensive stages.
    Identical text means identical shingle sets, hence Jaccard 1.0 with
    the representative and identical similarity to every other document
    — so LSH banding, Jaccard verification, and label propagation over
    representatives followed by a label expansion is OUTPUT-IDENTICAL
    to the per-copy pipeline (the representative is the group min, so
    min-reachable-id labels agree; asserted pairwise in
    tests/test_pipeline_ops2.py on planted duplicates).  One asymmetry,
    and it favors this path: a page duplicated beyond ``bucket_cap``
    floods every one of its LSH buckets past the cap in the per-copy
    pipeline, silently dropping its edges to OTHER near-dup texts;
    collapsed, it is ONE band row per band and the edges survive.

    Scale shape (why this wins on a Common-Crawl-like corpus where a
    large fraction of pages are byte-identical):

    - the group key ``md5(text)`` is computed row-locally; document
      text NEVER shuffles in either path (the membership exchange
      carries (id, 16-byte hash) and the signature aggregate is keyed
      on the hash with map-side combine, so identical copies collapse
      before the wire);
    - signature hashing still reads every copy's tokens (CPU only —
      the alternative, shipping representative texts to one place,
      is a corpus-sized shuffle), but band rows, candidate pairs
      (quadratic in bucket occupancy), Jaccard verifications, and CC
      vertices/edges all shrink to one per DISTINCT text;
    - md5 (128-bit) rather than xxhash64 for the group key: at 10^12
      documents a 64-bit key expects ~50k birthday collisions, each
      silently fusing two unrelated texts into one "exact" group;
      at 128 bits the expectation is ~3e-15.
    """
    from .dedup import (lsh_band_pairs, minhash_lsh_candidates,
                        minhash_signatures, ngram_jaccard)

    if not collapse_exact:
        cand = minhash_lsh_candidates(docs, id_col, text_col, k_shingle,
                                      n_hashes, n_bands, seed, bucket_cap)
        pairs = (ngram_jaccard(cand, docs, id_col, text_col, k_shingle)
                 .filter(F.col("jaccard") >= jaccard_threshold))
        return connected_components(pairs)

    ch = F.md5(F.col(text_col))
    # _sh_ok mirrors shingle_hash_array's emptiness rule (>= k tokens):
    # an exact-dup group of degenerate texts has Jaccard NULL with
    # itself (empty shingle sets) and is excluded by the per-copy
    # pipeline's threshold filter, so it must be excluded here too.
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    mem = docs.select(F.col(id_col), ch.alias("_ch"),
                      (F.size(toks) >= k_shingle).alias("_sh_ok"))
    # grp is joined twice below (membership mapping + rep signatures);
    # without the checkpoint each reference re-runs the corpus scan and
    # the (id, hash) exchange behind the aggregate — materialized it is
    # one narrow row per DISTINCT text.  mapping and rep_sigs are each
    # referenced ONCE, so their round-5 checkpoints only added a toRdd
    # plan-compilation and a materialization job apiece — dropped in
    # round 6 (interleaved A/B 1.69s -> 1.51s end-to-end at sf0.1,
    # output identical).
    grp = (mem.groupBy("_ch")
              .agg(F.min(id_col).alias("_rep"),
                   F.count(F.lit(1)).alias("_n"))
              .localCheckpoint(eager=False))
    mapping = (mem.join(grp, "_ch")
                  .select(id_col, "_rep", "_n", "_sh_ok"))
    # signature aggregate keyed on the CONTENT HASH: map-side combine
    # merges copies within a partition and the final agg merges across,
    # so the exchange and everything downstream carry one row per
    # distinct text.
    sigs_ch = minhash_signatures(
        docs.select(ch.alias("_ch"), F.col(text_col)),
        id_col="_ch", text_col=text_col, k_shingle=k_shingle,
        n_hashes=n_hashes, seed=seed)
    rep_sigs = (sigs_ch.join(grp.select("_ch", "_rep"), "_ch")
                       .select(F.col("_rep").alias(id_col), "signature"))
    cand = lsh_band_pairs(rep_sigs, id_col, n_hashes, n_bands, bucket_cap)
    verified = (ngram_jaccard(cand, docs, id_col, text_col, k_shingle)
                .filter(F.col("jaccard") >= jaccard_threshold))
    cc = connected_components(verified)
    # expand representative labels to group members; dup groups whose
    # representative has no cross-text edge still cluster (their
    # members pair with each other at Jaccard 1.0 in the per-copy
    # pipeline), labeled by the representative = group min id.
    return (mapping.join(cc.withColumnRenamed("id", "_rep"), "_rep", "left")
                   .where(F.col("component").isNotNull()
                          | ((F.col("_n") >= 2) & F.col("_sh_ok")))
                   .select(F.col(id_col).alias("id"),
                           F.coalesce("component", "_rep")
                            .alias("component")))


def duplicate_groups(edges: DataFrame, src: str = "id_a",
                     dst: str = "id_b") -> DataFrame:
    """Per-component summary: (component, n_members, keep_id) with
    ``keep_id`` = smallest member (the canonical survivor)."""
    cc = connected_components(edges, src, dst)
    return (cc.groupBy("component")
              .agg(F.count(F.lit(1)).alias("n_members"),
                   F.min("id").alias("keep_id")))
