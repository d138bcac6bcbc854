"""Iterative graph analytics over derived relations — the PageRank slot of
the north-star surface (SURVEY.md §2.2 "iterative algorithms"), next to the
connected-components machinery in functions/graph.py.

The graph is DERIVED, not stored: part–part co-purchase edges come from a
self-join of lineitem on l_orderkey. TPC-H orders hold at most 7 lines, so
the per-order pair fanout is bounded by 21 — the join is linear in the fact
table, never quadratic (the d3/d13 discipline).

PageRank runs a FIXED number of synchronous iterations (deterministic — a
convergence test would make the result depend on float scheduling). Each
iteration is ONE join (edges ⋈ ranks on src) + ONE aggregation (sum of
contributions by dst): both hash-shuffle on the same node key, so at scale
AQE reuses co-partitioning, and lineage is truncated every few iterations
(materialize) so the plan does not grow with the iteration count — the
standard Pregel-on-DataFrames shape.

Rows-only by design: the rank vector is float-iteration output with no SQL
twin; tests/test_graphs.py re-runs the same power iteration in numpy on the
collected edge list and matches ranks to 1e-9 (same math, independent code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tts_etl_pipeline_spark.functions.checkpoints import materialize
from tts_etl_pipeline_spark.sources.tables import table

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


PR_DAMPING = 0.85
PR_ITERATIONS = 10
PR_TOP_K = 20


def copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part–part co-purchase edges with multiplicity.

    Self-join on l_orderkey with partkey< to emit each unordered pair once,
    then symmetrize. `weight` counts co-occurrences (two parts bought
    together in many orders bind more strongly)."""
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, on=[F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                      F.col("a.l_partkey") < F.col("b.l_partkey")])
        .groupBy(
            F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    return pairs.selectExpr("u AS src", "v AS dst", "weight").unionByName(
        pairs.selectExpr("v AS src", "u AS dst", "weight")
    )


def pagerank(edges: DataFrame, damping: float = PR_DAMPING,
             iterations: int = PR_ITERATIONS) -> DataFrame:
    """Weighted PageRank over a symmetrized edge list.

    Transition probability out of a node distributes proportionally to edge
    weight. Returns (node, rank) with ranks summing to 1 (no dangling nodes:
    every node in a symmetrized edge list has out-degree ≥ 1)."""
    out_w = edges.groupBy("src").agg(F.sum("weight").alias("w_out"))
    # normalized transition edges — computed once, reused every iteration
    trans = materialize(
        edges.join(out_w, "src").select(
            "src", "dst", (F.col("weight") / F.col("w_out")).alias("p")
        )
    )
    nodes = materialize(trans.select(F.col("src").alias("node")).distinct())
    n = nodes.count()  # control-plane scalar (drives the teleport term)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for i in range(iterations):
        contrib = (
            trans.join(ranks, trans["src"] == ranks["node"])
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("in_rank"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping) * F.coalesce("in_rank", F.lit(0.0))
            ).alias("rank"),
        )
        # truncate lineage every 3 sweeps so the plan stays iteration-bounded
        if (i + 1) % 3 == 0:
            ranks = materialize(ranks)
    return ranks


# ---------------------------------------------------------------------------
# pr1 — PageRank over the co-purchase graph, top-20 central parts. The
# "which items anchor the catalog" query; the same loop body serves any
# derived similarity/citation graph. Scale shape per sweep: one src-keyed
# shuffle join + one dst-keyed aggregation; TakeOrdered top-k at the end
# (no global sort). Ranks are scaled to basis points of the uniform rank
# (rank·n·10⁴ rounded to int) ONLY for display stability of the trailing
# digits; ordering and the pinned numpy parity use the raw doubles.
# ---------------------------------------------------------------------------
@_register("pr1_copurchase_pagerank", None)
def pr1_copurchase_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = materialize(copurchase_edges(spark, sf_dir))
    ranks = pagerank(edges)
    deg = edges.groupBy("src").agg(
        F.count(F.lit(1)).alias("degree"), F.sum("weight").alias("w_degree")
    )
    return (
        ranks.join(deg, ranks["node"] == deg["src"])
        .select(
            F.col("node").alias("partkey"),
            "rank",
            "degree",
            F.col("w_degree").cast("bigint").alias("w_degree"),
        )
        .orderBy(F.desc("rank"), "partkey")
        .limit(PR_TOP_K)
    )
