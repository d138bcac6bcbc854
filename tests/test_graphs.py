"""pr1 PageRank: independent numpy power-iteration parity + plan shape."""

from __future__ import annotations

import numpy as np

from tts_etl_pipeline_spark.operators.graphs import (
    PR_DAMPING,
    PR_ITERATIONS,
    copurchase_edges,
    pagerank,
    pr1_copurchase_pagerank,
)


def _numpy_pagerank(edges, damping, iterations):
    """Same math, independent code: dense power iteration on the edge list."""
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    P = np.zeros((n, n))
    for src, dst, w in edges:
        P[idx[dst], idx[src]] += w
    P /= P.sum(axis=0, keepdims=True)  # column-stochastic (no dangling nodes)
    r = np.full(n, 1.0 / n)
    for _ in range(iterations):
        r = (1.0 - damping) / n + damping * (P @ r)
    return dict(zip(nodes, r))


def test_pagerank_matches_numpy_power_iteration(spark, sf_dir):
    edges_df = copurchase_edges(spark, sf_dir)
    edges = [(r["src"], r["dst"], r["weight"]) for r in edges_df.collect()]
    expect = _numpy_pagerank(edges, PR_DAMPING, PR_ITERATIONS)
    got = {r["node"]: r["rank"] for r in pagerank(edges_df).collect()}
    assert set(got) == set(expect)
    for node, rank in got.items():
        assert abs(rank - expect[node]) < 1e-9, (node, rank, expect[node])
    # a probability vector: sums to 1
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_copurchase_edges_are_symmetric_and_bounded(spark, sf_dir):
    edges_df = copurchase_edges(spark, sf_dir)
    rows = {(r["src"], r["dst"]): r["weight"] for r in edges_df.collect()}
    for (s, d), w in rows.items():
        assert s != d
        assert rows[(d, s)] == w  # symmetrized with equal weight
    # per-order fanout bound: <= C(7,2) unordered pairs per order means the
    # edge multiset is linear in lineitem — weights stay small at tiny SF
    assert max(rows.values()) <= 21


def test_pr1_top20_runs_and_is_ranked(spark, sf_dir):
    out = pr1_copurchase_pagerank(spark, sf_dir).collect()
    assert len(out) == 20
    ranks = [r["rank"] for r in out]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["degree"] >= 1 for r in out)
