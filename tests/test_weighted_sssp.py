"""Weighted cheapest-path semantics (association.py:graph_weighted_cheapest).

The hash gate replays the same unrolled min-plus rounds in DuckDB —
it would NOT catch a shared conceptual bug (e.g. BFS-style COALESCE
instead of LEAST re-relaxation on both sides).  This test recomputes
the bounded-horizon Bellman-Ford independently in plain Python over
the same weighted edge list and checks (a) exact agreement and (b)
that re-relaxation is NON-VACUOUS on the fixture: some node's optimal
<=4-edge path is strictly cheaper than its best direct seed edge."""

from __future__ import annotations

from collections import defaultdict

from tda596_lab02mapreduce_spark.queries.association import (
    _copurchase_edges,
    graph_weighted_cheapest,
)


def test_sssp_matches_python_bellman_ford(spark, sf_smoke):
    e = _copurchase_edges(spark, sf_smoke, with_weight=True)
    edges = [(r["src"], r["dst"], int(r["w"])) for r in e.collect()]
    e.unpersist()
    deg = defaultdict(int)
    for s, _, _ in edges:
        deg[s] += 1
    seeds = [n for n, _ in sorted(deg.items(), key=lambda kv: (-kv[1], kv[0]))[:5]]

    INF = 10**15
    dist = {n: INF for n in deg}
    for s in seeds:
        dist[s] = 0
    adj = defaultdict(list)
    for s, d, w in edges:
        adj[s].append((d, w))
    for _ in range(4):
        nd = dict(dist)
        for u, du in dist.items():
            if du >= INF:
                continue
            for v, w in adj[u]:
                if du + w < nd[v]:
                    nd[v] = du + w
        dist = nd
    expect = {n: d for n, d in dist.items() if d < INF}

    got = {
        r["part_id"]: int(r["cost_u"])
        for r in graph_weighted_cheapest(spark, sf_smoke).collect()
    }
    assert got == expect

    # non-vacuity: re-relaxation must matter — at least one node's
    # cheapest bounded path is strictly cheaper than any DIRECT edge
    # from a seed (i.e. the best route uses >= 2 edges)
    direct = defaultdict(lambda: INF)
    for s, d, w in edges:
        if s in seeds:
            direct[d] = min(direct[d], w)
    improved = [
        n for n, c in expect.items()
        if n not in seeds and c < direct[n]
    ]
    assert improved, "every optimum was a direct seed edge — relaxation vacuous"
