"""Iterative graph operator: connected components over a pair list.

The missing last step of every near-dup pipeline: pair generators
(t_simhash_hamming_pairs, t_minhash_lsh_pairs, t_chunk_dup_pairs) emit
EDGES, but a dedup decision needs CLUSTERS — "keep one doc per connected
component". Transitive closure is inherently iterative, the one shape in
this engine Catalyst cannot express in a single plan; the idiomatic
Spark answer is a driver-side loop of DataFrame steps (the same structure
GraphX/GraphFrames use internally), NOT a collect()-and-compute fallback:
each iteration is two distributed shuffles, the driver only sees a single
convergence count.

Cost model at scale: iterations = O(component diameter) — near-dup
clusters are shallow (dozens of docs, diameter ~2-4), so 3-5 rounds in
practice, `max_iters` bounds the worst case. Each round joins the edge
list (shuffled once on src, reusable from cache) against the current
labels and min-aggregates — both partial-agg friendly. `localCheckpoint`
every round truncates the lineage so plan size stays O(1) per iteration
instead of O(iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def connected_components(
    pairs: DataFrame, src: str, dst: str, max_iters: int = 20
) -> DataFrame:
    """(node, cluster_id) for every node in ``pairs``, where cluster_id is
    the smallest node id reachable through the undirected pair graph —
    a deterministic canonical representative per component.

    Min-label propagation: every node starts labeled with itself; each
    round a node adopts the minimum label among itself and its neighbors;
    fixpoint = components done. Converges in <= diameter rounds; raises
    if ``max_iters`` rounds aren't enough (a pathological chain —
    at that point use doubling/small-star variants, not a bigger budget).
    """
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("cluster_id"))
        .localCheckpoint()
    )

    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.b == labels.node)
            .groupBy("a")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.cluster_id") != F.col("o.cluster_id"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components did not converge in {max_iters} iterations")
