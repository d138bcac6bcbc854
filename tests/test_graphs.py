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


def test_pr2_triangles_on_known_graph(spark, tmp_path):
    """Analytic fixture: one 4-part order makes K4 (every node: degree 3,
    3 triangles, clustering 1.0 = 10000 bp); a 2-part order makes a lone
    edge (degree 1, 0 triangles). A part repeated across orders must not
    duplicate edges (DISTINCT) or inflate counts."""
    from tts_etl_pipeline_spark.operators.graphs import pr2_triangle_clustering

    rows = [(1, p) for p in (101, 102, 103, 104)] + [(2, 201), (2, 202)]
    # order 3 repeats an existing K4 edge — must be deduplicated
    rows += [(3, 101), (3, 102)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r["partkey"]: (r["degree"], r["triangles"], r["cc_bp"])
        for r in pr2_triangle_clustering(spark, str(tmp_path)).collect()
    }
    for p in (101, 102, 103, 104):
        assert out[p] == (3, 3, 10000), (p, out[p])
    for p in (201, 202):
        assert out[p] == (1, 0, 0), (p, out[p])


def test_pr2_triangle_total_matches_bruteforce(spark, sf_dir):
    """Sum of per-node counts = 3x the number of triangles found by a
    brute-force itertools check over the collected distinct edge set."""
    from itertools import combinations

    from tts_etl_pipeline_spark.operators.graphs import pr2_triangle_clustering

    edges = {
        (r["src"], r["dst"])
        for r in copurchase_edges(spark, sf_dir).select("src", "dst").collect()
    }
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    tri_at = {n: 0 for n in adj}
    n_tri = 0
    for n, nbrs in adj.items():
        for a, b in combinations(sorted(nbrs), 2):
            if a > n and b in adj.get(a, ()):  # count each triangle at its min node
                n_tri += 1
                for v in (n, a, b):
                    tri_at[v] += 1
    top = pr2_triangle_clustering(spark, sf_dir).collect()
    for r in top:
        assert r["triangles"] == tri_at[r["partkey"]], r
        d = r["degree"]
        assert d == len(adj[r["partkey"]])
        expect_cc = (20000 * r["triangles"]) // (d * (d - 1)) if d >= 2 else 0
        assert r["cc_bp"] == expect_cc


def test_pr3_bfs_on_path_graph(spark, tmp_path):
    """Analytic fixture: orders {1,2},{2,3},{3,4} make the path 1-2-3-4.
    Highest degree is tied between 2 and 3 -> root is 2 (smallest id).
    A disconnected edge {10,11} must not appear in the histogram."""
    from tts_etl_pipeline_spark.operators.graphs import pr3_bfs_hop_distances

    rows = [(1, 1), (1, 2), (2, 2), (2, 3), (3, 3), (3, 4), (4, 10), (4, 11)]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").write.parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {
        r["dist"]: (r["n_nodes"], r["min_part"], r["max_part"])
        for r in pr3_bfs_hop_distances(spark, str(tmp_path)).collect()
    }
    assert out == {0: (1, 2, 2), 1: (2, 1, 3), 2: (1, 4, 4)}


def test_pr3_matches_driver_side_bfs(spark, sf_dir):
    """Histogram vs an independent deque BFS over the collected edge set."""
    from collections import deque

    from tts_etl_pipeline_spark.operators.graphs import pr3_bfs_hop_distances

    edges = {
        (r["src"], r["dst"])
        for r in copurchase_edges(spark, sf_dir).select("src", "dst").collect()
    }
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    root = max(adj, key=lambda n: (len(adj[n]), -n))
    dist = {root: 0}
    q = deque([root])
    while q:
        n = q.popleft()
        if dist[n] >= 20:
            continue
        for m in adj[n]:
            if m not in dist:
                dist[m] = dist[n] + 1
                q.append(m)
    expect: dict = {}
    for n, d in dist.items():
        c, lo, hi = expect.get(d, (0, n, n))
        expect[d] = (c + 1, min(lo, n), max(hi, n))
    out = {
        r["dist"]: (r["n_nodes"], r["min_part"], r["max_part"])
        for r in pr3_bfs_hop_distances(spark, sf_dir).collect()
    }
    assert out == expect


def test_pr4_link_prediction_matches_bruteforce(spark, sf_dir):
    """pr4's capped-wedge candidate generation must equal a driver-side
    brute force of the same definition: strong edges (co-purchase weight
    >= PR4_MIN_WEIGHT), wedges only through centers with degree <=
    PR4_CENTER_CAP, candidates must be NON-edges, ranked by
    (common_neighbors, pref_attach) desc."""
    from collections import Counter, defaultdict

    from tts_etl_pipeline_spark.operators.graphs import (
        PR4_CENTER_CAP,
        PR4_MIN_WEIGHT,
        PR4_TOP_K,
        pr4_link_prediction,
    )
    from tts_etl_pipeline_spark.sources.tables import table

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r[0]].add(r[1])
    wcount = Counter()
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u < v:
                    wcount[(u, v)] += 1
    edges = {p for p, w in wcount.items() if w >= PR4_MIN_WEIGHT}
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cn = Counter()
    for center, nbrs in adj.items():
        if len(nbrs) <= PR4_CENTER_CAP:
            snb = sorted(nbrs)
            for i, a in enumerate(snb):
                for b in snb[i + 1 :]:
                    cn[(a, b)] += 1
    scored = [
        (c, len(adj[a]) * len(adj[b]), a, b)
        for (a, b), c in cn.items()
        if (a, b) not in edges
    ]
    scored.sort(key=lambda t: (-t[0], -t[1], t[2], t[3]))
    expected = [
        (a, b, c, pa) for c, pa, a, b in scored[:PR4_TOP_K]
    ]
    got = [
        (r["part_a"], r["part_b"], r["common_neighbors"], r["pref_attach"])
        for r in pr4_link_prediction(spark, sf_dir).collect()
    ]
    assert got == expected


def test_pr5_kcore_matches_bruteforce(spark, sf_dir):
    """pr5's bounded synchronous peel must land on the TRUE k-core (unique
    maximal subgraph with min degree >= K — independent of peeling order),
    verified against a driver-side peel-to-fixpoint over the same strong
    edge set. Also pins the output shape: exact degree histogram of the
    surviving core."""
    from collections import Counter, defaultdict

    from tts_etl_pipeline_spark.operators.graphs import (
        PR4_MIN_WEIGHT,
        PR5_K,
        pr5_kcore_decomposition,
    )
    from tts_etl_pipeline_spark.sources.tables import table

    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").collect()
    by_order = defaultdict(set)
    for r in li:
        by_order[r[0]].add(r[1])
    wcount = Counter()
    for parts in by_order.values():
        for u in parts:
            for v in parts:
                if u < v:
                    wcount[(u, v)] += 1
    adj = defaultdict(set)
    for (u, v), w in wcount.items():
        if w >= PR4_MIN_WEIGHT:
            adj[u].add(v)
            adj[v].add(u)
    alive = set(adj)
    while True:
        drop = {n for n in alive if len(adj[n] & alive) < PR5_K}
        if not drop:
            break
        alive -= drop
    hist = defaultdict(lambda: [0, None, None])
    for n in alive:
        d = len(adj[n] & alive)
        h = hist[d]
        h[0] += 1
        h[1] = n if h[1] is None else min(h[1], n)
        h[2] = n if h[2] is None else max(h[2], n)
    expected = {d: tuple(v) for d, v in hist.items()}
    got = {
        r["degree"]: (r["n_nodes"], r["min_part"], r["max_part"])
        for r in pr5_kcore_decomposition(spark, sf_dir).collect()
    }
    assert got == expected


def test_copurchase_artifact_derives_once_and_matches_scratch(spark, sf_dir):
    """Round-7 verdict task 3: a full pr2..pr5 sweep must derive the
    co-purchase pair relation from lineitem exactly ONCE (the shared
    parquet artifact), the artifact must equal the from-scratch
    derivation row-for-row, and pr1 (the designated derivation-from-
    scratch proof query) must not touch the artifact at all."""
    from tts_etl_pipeline_spark.operators import graphs as G

    G._ARTIFACT_CACHE.clear()
    before = G.ARTIFACT_DERIVATIONS["count"]
    for fn in (
        G.pr2_triangle_clustering,
        G.pr3_bfs_hop_distances,
        G.pr4_link_prediction,
        G.pr5_kcore_decomposition,
        G.pr6_copurchase_components,
    ):
        fn(spark, sf_dir).collect()
    assert G.ARTIFACT_DERIVATIONS["count"] == before + 1, (
        "pr2..pr6 sweep must build the shared artifact exactly once"
    )
    # layout pin: the artifact must be MULTI-part on disk (an AQE-coalesced
    # single file would serialize downstream first-stage scans into 1 task)
    import os as _os

    art_path = next(iter(G._ARTIFACT_CACHE.values()))
    n_parts = len([f for f in _os.listdir(art_path) if f.endswith(".parquet")])
    assert n_parts > 1, f"artifact wrote {n_parts} part file(s)"
    art_rows = G.copurchase_artifact(spark, sf_dir).collect()
    art = sorted((r["u"], r["v"]) for r in art_rows)
    scratch = sorted(
        (r["u"], r["v"]) for r in G.copurchase_pairs(spark, sf_dir).collect()
    )
    assert art == scratch
    # n_orders must equal the oracles' COUNT(DISTINCT orderkey) semantics —
    # checked VALUE-for-value against a from-scratch countDistinct (a plain
    # COUNT(*) would inflate pairs where a part repeats within one order)
    from pyspark.sql import functions as F

    from tts_etl_pipeline_spark.sources.tables import table as _table

    li = _table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    a, b = li.alias("a"), li.alias("b")
    scratch_w = {
        (r["u"], r["v"]): r["w"]
        for r in a.join(
            b,
            on=[
                F.col("a.l_orderkey") == F.col("b.l_orderkey"),
                F.col("a.l_partkey") < F.col("b.l_partkey"),
            ],
        )
        .groupBy(F.col("a.l_partkey").alias("u"), F.col("b.l_partkey").alias("v"))
        .agg(F.countDistinct(F.col("a.l_orderkey")).alias("w"))
        .collect()
    }
    art_w = {(r["u"], r["v"]): r["n_orders"] for r in art_rows}
    assert art_w == scratch_w
    # pr1 stays from-scratch: no new artifact derivation
    after = G.ARTIFACT_DERIVATIONS["count"]
    G.pr1_copurchase_pagerank(spark, sf_dir).collect()
    assert G.ARTIFACT_DERIVATIONS["count"] == after
