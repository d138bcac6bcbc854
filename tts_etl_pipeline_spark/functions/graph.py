"""Distributed connected components via alternating large-star / small-star
(Kiveris et al., "Connected Components in MapReduce and Beyond", 2014).

This is the 100 TB-scale companion to the min-label propagation in
operators/dedup.py: propagation needs O(component diameter) rounds, so a
pathological near-dup CHAIN (each doc similar to the next) costs one shuffle
per hop — large-star/small-star contracts the graph toward stars and
converges in O(log n) rounds regardless of diameter. Both compute the same
unique fixpoint (every node labeled with its component's minimum node id),
so they are interchangeable and oracle-checkable against the same DuckDB
recursive-CTE transitive closure.

Per round, each step is one groupBy (min neighbor per node) + one join back
to the edge list — all shuffles are keyed by node id, no global structure.
materialize() truncates lineage between rounds (reliable checkpoint on a
cluster, executor-local otherwise — functions/checkpoints.py).

Algorithm (edges undirected, no self-loops; Γ(u) = neighbors of u):
  large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
  small-star(u): edges oriented so u > v; m = min(Γ(u)); emit (v, m) for
                 v ∈ Γ(u) ∪ {u}, v ≠ m
Alternate until the edge set reaches its fixpoint: a forest of depth-1
stars, each rooted at its component's minimum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.functions.checkpoints import materialize


def connected_components(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """Connected components of an undirected edge list.

    `edges` needs columns (src, dst); orientation and duplicates don't
    matter, self-loops are ignored. Returns (node, label) with label = the
    minimum node id in the node's component, for every node incident to at
    least one edge — identical contract to dedup._min_label_propagation.

    Raises RuntimeError if no fixpoint within `max_rounds` (with the
    O(log n) bound, hitting 50 means the input is pathological — silently
    returning a non-fixpoint would mislabel components).
    """
    edges = materialize(
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    prev_probe = None
    for _ in range(max_rounds):
        # -------- large-star: group the SYMMETRIC adjacency by u ----------
        sym = edges.unionAll(
            edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        mins = (
            sym.groupBy("src")
            .agg(F.min("dst").alias("mn"))
            .select("src", F.least("mn", F.col("src")).alias("m"))
        )
        large = (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        # -------- small-star: orient each edge at its LARGER endpoint -----
        e2 = large.select(
            F.greatest("src", "dst").alias("u"), F.least("src", "dst").alias("v")
        ).filter(F.col("u") != F.col("v"))
        minv = e2.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            e2.join(minv, "u")
            .select(F.col("v").alias("src"), F.col("m").alias("dst"))
            .unionAll(minv.select(F.col("u").alias("src"), F.col("m").alias("dst")))
            .filter(F.col("src") != F.col("dst"))
            .distinct()
        )
        new_edges = materialize(small)
        # scalar convergence probe (count + endpoint sums; the endpoint sum
        # is a non-increasing potential). On a probe match, CONFIRM with an
        # exact set comparison — only runs in the final round(s), on the
        # already-contracted star edges.
        row = new_edges.agg(
            F.count(F.lit(1)), F.sum("src"), F.sum("dst")
        ).collect()[0]
        probe = (row[0], row[1], row[2])
        if probe == prev_probe and new_edges.exceptAll(edges).limit(1).count() == 0:
            edges = new_edges
            break
        prev_probe = probe
        edges = new_edges
    else:
        raise RuntimeError(
            f"large-star/small-star did not converge within {max_rounds} "
            "rounds — with the O(log n) bound this means a pathological "
            "input; refusing to return a non-fixpoint labeling."
        )
    # fixpoint: every edge is (child, component-min root)
    members = edges.select(F.col("src").alias("node"), F.col("dst").alias("label"))
    roots = (
        edges.select(F.col("dst").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    return members.unionAll(roots).distinct()
