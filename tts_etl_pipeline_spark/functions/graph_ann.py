"""Graph-based ANN: distributed NN-Descent kNN-graph build + batched beam
search (v5). The second ANN architecture next to IVF (operators/similarity),
and the one that keeps working when the corpus has NO cluster structure —
spatial partitioning (IVF/LSH) caps out on uniform-random embeddings (see
test_ann_recall.py's measured ceiling), while greedy graph routing only
needs *local* proximity to navigate.

Public-algorithm provenance: NN-Descent is Dong/Moses/Li, "Efficient
k-nearest neighbor graph construction for generic similarity measures",
WWW'11 — iterate "my neighbors' neighbors are probably my neighbors".
Search is standard NSW-style best-first beam search, batched for Spark:
every query advances one hop per round, so H hops = H joins, not H
round-trips per query.

Everything is deterministic: init edges and entry points come from
xxhash64, scoring ties break on node id, so results are stable across
runs/partitionings (the property the rows-only driver check + pytest
recall floors rely on).

Scale shape:
- build round: edges ⋈ edges (neighbors-of-neighbors) produces n·K² candidate
  rows, scored JVM-side, top-K kept per node via a window partitioned by
  node — the textbook NN-Descent cost, shuffling on node id only;
- search hop: frontier ⋈ edges produces (queries · beam · K) rows — constant
  in corpus size; the corpus is only touched through the edge list.
- the edge list (n·K rows) is the index artifact: at 100 TB it would be
  built once, stored bucketed by node id, and shared by every query batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tts_etl_pipeline_spark.functions.checkpoints import materialize
from tts_etl_pipeline_spark.operators.similarity import dot, norm

# graph degree: r5 re-tune after the dense-ordinal rework perturbed the
# deterministic init (recall moved 0.86 -> 0.70 at k=12 — seed luck on the
# 500-vector fixture). Measured sweep on the fixture, default search budget:
# k=12 0.70, k=16 0.92 (beam=24/ents=8 buys 0.98-1.00 at 1.25x search cost).
# Degree is an INDEX-build knob: build cost scales n*k^2 (once), search cost
# is unchanged — the right side of the trade for a build-once/query-many
# artifact.
K_NEIGHBORS = 16
N_DESCENT_ROUNDS = 3
BEAM = 16
N_HOPS = 3
N_ENTRIES = 4  # seeded entry points per query


def _cosine_pre(a_emb: str, b_emb: str, a_nrm: str, b_nrm: str):
    """Cosine from embeddings + PRECOMPUTED norms. dot()/norm() are
    higher-order aggregate() expressions (interpreted per element, no
    codegen — r14 profiled the NN-Descent scoring stages at ~46 s CPU for
    ~2M pairs, 3 aggregates each); the norm is a per-NODE quantity, so
    computing it once per node in prepare_nodes and joining it alongside
    the embedding removes 2 of the 3 per-PAIR aggregates. Values are
    BIT-IDENTICAL to dot(a,b)/(norm(a)*norm(b)): same operands, same
    fold order, same multiply-then-divide."""
    return dot(a_emb, b_emb) / (F.col(a_nrm) * F.col(b_nrm))


_ORD_BUCKETS = 1024  # constant — the offset relation never grows with n


def _dense_ordinals(nodes: DataFrame) -> DataFrame:
    """(id, ord) with ord a dense 0..n-1 bijection, WITHOUT a global window.

    The hash-mod-n init only needs *some* deterministic dense bijection, not
    one that respects global id order — so ids hash into a CONSTANT number
    of buckets (balanced by construction), ranks come from a window
    PARTITIONED by bucket, and bucket offsets from an exclusive cumsum over
    the bucket-count relation, which has at most _ORD_BUCKETS rows no matter
    the corpus size. Same discipline as t12's prefix sum: the only
    unpartitioned window runs over a bounded-constant relation."""
    d = nodes.select("id", (F.abs(F.xxhash64("id")) % _ORD_BUCKETS).alias("b"))
    counts = d.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    # bounded: the bucket-count relation has <= _ORD_BUCKETS = 1024 rows
    # regardless of corpus size
    w_off = W.orderBy("b").rowsBetween(W.unboundedPreceding, -1)
    offsets = counts.select(
        "b", F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off")
    )
    w_rank = W.partitionBy("b").orderBy("id")
    return d.join(F.broadcast(offsets), "b").select(
        "id",
        (F.col("off") + F.row_number().over(w_rank) - 1).alias("ord"),
    )


def prepare_nodes(emb: DataFrame) -> tuple[DataFrame, int, DataFrame]:
    """(nodes, n, ordinals) for the build/search passes, each materialized
    once. v5 runs build THEN search over the SAME corpus; before r14 each
    pass re-materialized the node projection, re-counted it, and re-derived
    the dense-ordinal map (a groupBy + bucket window + broadcast join) —
    two checkpoint barriers, one count job and one ordinal build doing
    nothing the first pass hadn't already done. Callers that run only one
    pass (the recall tests) still get the same relations lazily."""
    nodes = materialize(
        emb.select(
            F.col("vec_id").alias("id"),
            F.col("embedding").alias("e"),
            norm("embedding").alias("nrm"),  # once per node, not per pair
        )
    )
    n = nodes.count()
    # dense ordinal <-> id map for hash-mod-n init (ids need not be dense);
    # built without a global window — see _dense_ordinals
    ordinals = materialize(_dense_ordinals(nodes))
    return nodes, n, ordinals


def build_knn_graph(
    emb: DataFrame,
    k: int = K_NEIGHBORS,
    rounds: int = N_DESCENT_ROUNDS,
    prepared: tuple[DataFrame, int, DataFrame] | None = None,
) -> DataFrame:
    """NN-Descent: returns the directed kNN edge list (src, dst, cosine).

    Init: k pseudo-random edges per node (xxhash64 over (id, salt) mod n,
    mapped to ids through a dense ordinal — deterministic, no rand()).
    Round: candidates = current edges ∪ two-hop edges over the UNDIRECTED
    graph (reversed one-hop edges participate as transit points of the
    two-hop expansion, not as direct candidates — including them directly
    was tried in r5 and measured recall 0.72 vs 0.86 on the uniform
    fixture, so the implemented candidate set is the keeper), scored
    exactly, top-k kept per src."""
    nodes, n, ordinals = prepared if prepared is not None else prepare_nodes(emb)
    salts = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("salt")
    init = (
        nodes.select("id", salts)
        .withColumn("ord", F.abs(F.xxhash64("id", "salt")) % n)
        .join(ordinals.select(F.col("id").alias("dst"), "ord"), "ord")
        .filter(F.col("id") != F.col("dst"))
        .select(F.col("id").alias("src"), "dst")
        .distinct()
    )
    edges = _score_and_trim(init, nodes, k)
    for _ in range(rounds):
        fwd = edges.select("src", "dst")
        rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        undirected = materialize(fwd.union(rev).distinct())
        two_hop = (
            undirected.alias("ab")
            .join(
                undirected.alias("bc"),
                F.col("ab.dst") == F.col("bc.src"),
            )
            .select(F.col("ab.src").alias("src"), F.col("bc.dst").alias("dst"))
            .filter(F.col("src") != F.col("dst"))
        )
        cands = fwd.union(two_hop).distinct()
        edges = _score_and_trim(cands, nodes, k)
    return edges


def _score_and_trim(pairs: DataFrame, nodes: DataFrame, k: int) -> DataFrame:
    scored = (
        pairs.join(
            nodes.select(
                F.col("id").alias("src"), F.col("e").alias("se"), F.col("nrm").alias("snrm")
            ),
            "src",
        )
        .join(
            nodes.select(
                F.col("id").alias("dst"), F.col("e").alias("de"), F.col("nrm").alias("dnrm")
            ),
            "dst",
        )
        .select("src", "dst", _cosine_pre("se", "de", "snrm", "dnrm").alias("cosine"))
    )
    w = W.partitionBy("src").orderBy(F.desc("cosine"), "dst")
    return materialize(
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("src", "dst", "cosine")
    )


def graph_search_topk(
    emb: DataFrame,
    edges: DataFrame,
    n_query: int,
    k: int,
    beam: int = BEAM,
    hops: int = N_HOPS,
    n_entries: int = N_ENTRIES,
    prepared: tuple[DataFrame, int, DataFrame] | None = None,
    track_seen: bool = True,
) -> tuple[DataFrame, DataFrame | None]:
    """Batched beam search over the kNN graph.

    Returns (topk, scored): topk = (q_id, n_id, cosine, rn) for the k best
    per query; scored = every distinct (q_id, n_id) pair the search ever
    scored — the candidate audit trail the recall tests use to assert the
    search stayed sublinear (|scored| ≈ entries + beam·K·hops per query,
    constant in corpus size). The trail is an AUDIT artifact: with
    track_seen=False (the v5 query path) its per-hop union+distinct
    checkpoints — one full shuffle + barrier per hop over the scored-pair
    superset, r14 measured 3 of the query's ~17 eager jobs — are skipped
    entirely and scored is None. Search results are unaffected: `seen`
    never feeds `best`."""
    nodes, n, ordinals = prepared if prepared is not None else prepare_nodes(emb)
    q = nodes.filter(F.col("id") < n_query).select(
        F.col("id").alias("q_id"), F.col("e").alias("qe"), F.col("nrm").alias("qnrm")
    )
    salts = F.explode(F.array(*[F.lit(1000 + i) for i in range(n_entries)])).alias(
        "salt"
    )
    entries = (
        q.select("q_id", salts)
        .withColumn("ord", F.abs(F.xxhash64("q_id", "salt")) % n)
        .join(ordinals.select(F.col("id").alias("n_id"), "ord"), "ord")
        .filter(F.col("n_id") != F.col("q_id"))
        .select("q_id", "n_id")
        .distinct()
    )
    best = _score_vs_queries(entries, q, nodes, beam)
    # the audit trail starts from the UNTRIMMED entry set: every entry pair
    # was scored, so initializing from the beam-trimmed `best` would
    # undercount whenever n_entries > beam (ADVICE r4)
    seen = entries.select("q_id", "n_id") if track_seen else None
    for _ in range(hops):
        frontier = best.select("q_id", "n_id")
        expanded = (
            frontier.join(edges.select(F.col("src").alias("n_id"), "dst"), "n_id")
            .select("q_id", F.col("dst").alias("n_id"))
            .filter(F.col("n_id") != F.col("q_id"))
            .union(frontier)
            .distinct()
        )
        best = _score_vs_queries(expanded, q, nodes, beam)
        if track_seen:
            seen = materialize(seen.union(expanded).distinct())
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    topk = (
        best.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= k)
        .select("q_id", "n_id", F.round("cosine", 9).alias("cosine"), "rn")
        .orderBy("q_id", "rn")
    )
    return topk, seen


def _score_vs_queries(
    pairs: DataFrame, q: DataFrame, nodes: DataFrame, beam: int
) -> DataFrame:
    scored = (
        pairs.join(F.broadcast(q), "q_id")
        .join(
            nodes.select(
                F.col("id").alias("n_id"), F.col("e").alias("ne"), F.col("nrm").alias("nnrm")
            ),
            "n_id",
        )
        .select("q_id", "n_id", _cosine_pre("qe", "ne", "qnrm", "nnrm").alias("cosine"))
    )
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), "n_id")
    return materialize(
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= beam)
        .select("q_id", "n_id", "cosine")
    )
