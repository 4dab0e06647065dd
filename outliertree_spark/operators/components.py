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
                         check_every: int = 1) -> DataFrame:
    """(id, component) for every vertex in ``edges``; ``component`` is
    the smallest vertex id reachable from ``id``.

    ``edges`` is an undirected pair list (each pair once, either
    orientation).  Isolated vertices are the caller's concern — join the
    result back to the full table with a coalesce to self."""
    e = (edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
              .union(edges.select(F.col(dst).alias("u"),
                                  F.col(src).alias("v")))
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


def duplicate_groups(edges: DataFrame, src: str = "id_a",
                     dst: str = "id_b") -> DataFrame:
    """Per-component summary: (component, n_members, keep_id) with
    ``keep_id`` = smallest member (the canonical survivor)."""
    cc = connected_components(edges, src, dst)
    return (cc.groupBy("component")
              .agg(F.count(F.lit(1)).alias("n_members"),
                   F.min("id").alias("keep_id")))
