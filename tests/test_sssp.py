"""Weighted shortest paths (graph/sssp.py) vs an exact Dijkstra replay."""

from __future__ import annotations

import heapq

import pandas as pd
import pytest

from split_merge_partitioner_spark.graph.sssp import shortest_paths
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _dijkstra(pdf: pd.DataFrame, sources: list[int], weights=None) -> dict[int, int]:
    adj: dict[int, list[tuple[int, int]]] = {}
    for i, (s, d) in enumerate(zip(pdf["src"], pdf["dst"])):
        w = 1 if weights is None else int(weights[i])
        adj.setdefault(int(s), []).append((int(d), w))
        adj.setdefault(int(d), []).append((int(s), w))
    dist: dict[int, int] = {}
    pq = [(0, s) for s in sources]
    while pq:
        d, v = heapq.heappop(pq)
        if v in dist:
            continue
        dist[v] = d
        for nb, w in adj.get(v, []):
            if nb not in dist:
                heapq.heappush(pq, (d + w, nb))
    return dist


def test_sssp_weighted_matches_dijkstra(spark):
    pdf = powerlaw_edges_pdf(n=80, m_per_node=3)
    weights = [(int(s) + int(d)) % 7 + 1 for s, d in zip(pdf["src"], pdf["dst"])]
    wpdf = pdf.assign(w=weights)
    got = (
        shortest_paths(spark.createDataFrame(wpdf), [0], max_supersteps=80, weight_col="w")
        .toPandas()
        .set_index("vertex")["dist"]
        .to_dict()
    )
    exp = _dijkstra(pdf, [0], weights)
    assert got == exp


def test_sssp_unit_weights_are_bfs_hops(spark):
    pdf = powerlaw_edges_pdf(n=60, m_per_node=2)
    got = (
        shortest_paths(spark.createDataFrame(pdf), [0], max_supersteps=60)
        .toPandas()
        .set_index("vertex")["dist"]
        .to_dict()
    )
    assert got == _dijkstra(pdf, [0])


def test_sssp_multi_source_min_semantics(spark):
    # path 0-1-2-3-4-5, unit weights, seeds {0,5}: dist = min(hops to 0, to 5)
    pdf = pd.DataFrame({"src": [0, 1, 2, 3, 4], "dst": [1, 2, 3, 4, 5]})
    got = (
        shortest_paths(spark.createDataFrame(pdf), [0, 5], max_supersteps=10)
        .toPandas()
        .set_index("vertex")["dist"]
        .to_dict()
    )
    assert got == {0: 0, 1: 1, 2: 2, 3: 2, 4: 1, 5: 0}


def test_sssp_horizon_truncates(spark):
    # path graph: 1 superstep reaches only 1 hop; weight of a longer detour
    # cannot beat the horizon
    pdf = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    got = (
        shortest_paths(spark.createDataFrame(pdf), [0], max_supersteps=1)
        .toPandas()
        .set_index("vertex")["dist"]
        .to_dict()
    )
    assert got == {0: 0, 1: 1}


def test_sssp_early_stop_is_fixpoint(spark):
    # diameter 3 -> fixpoint at 3 supersteps; a 50-superstep run must return
    # the identical relation (early stop makes it actually cheap)
    pdf = pd.DataFrame({"src": [0, 1, 2], "dst": [1, 2, 3]})
    a = shortest_paths(spark.createDataFrame(pdf), [0], max_supersteps=3).toPandas()
    b = shortest_paths(spark.createDataFrame(pdf), [0], max_supersteps=50).toPandas()
    assert a.sort_values("vertex").values.tolist() == b.sort_values("vertex").values.tolist()


def test_sssp_input_validation(spark):
    pdf = pd.DataFrame({"src": [0], "dst": [1]})
    df = spark.createDataFrame(pdf)
    with pytest.raises(ValueError, match="non-empty"):
        shortest_paths(df, [])
    with pytest.raises(ValueError, match="max_supersteps"):
        shortest_paths(df, [0], max_supersteps=0)


def test_widest_paths_hand_bottleneck(spark):
    from split_merge_partitioner_spark.graph.sssp import WIDTH_INF, widest_paths

    # 0 -5- 1 -2- 3   and   0 -3- 2 -3- 3: bottleneck to 3 is max(2,3)=3
    rows = [(0, 1, 5), (1, 3, 2), (0, 2, 3), (2, 3, 3)]
    e = spark.createDataFrame(rows, "src long, dst long, w long")
    got = {r.vertex: r.width for r in
           widest_paths(e, [0], capacity_col="w").collect()}
    assert got == {0: WIDTH_INF, 1: 5, 2: 3, 3: 3}


def test_widest_paths_matches_maximin_dijkstra(spark):
    import heapq
    import random

    from split_merge_partitioner_spark.graph.sssp import WIDTH_INF, widest_paths

    rng = random.Random(11)
    rows = sorted({
        (min(a, b), max(a, b))
        for a, b in ((rng.randrange(40), rng.randrange(40)) for _ in range(80))
        if a != b
    })
    wrows = [(a, b, (a + b) % 7 + 1) for a, b in rows]

    def maximin(srcs):
        adj = {}
        for a, b, w in wrows:
            adj.setdefault(a, []).append((b, w))
            adj.setdefault(b, []).append((a, w))
        best = {s: WIDTH_INF for s in srcs}
        heap = [(-WIDTH_INF, s) for s in srcs]
        while heap:
            nw, v = heapq.heappop(heap)
            nw = -nw
            if nw < best.get(v, -1):
                continue
            for u, w in adj.get(v, []):
                cand = min(nw, w)
                if cand > best.get(u, -1):
                    best[u] = cand
                    heapq.heappush(heap, (-cand, u))
        return best

    e = spark.createDataFrame(wrows, "src long, dst long, w long")
    # enough supersteps to reach the fixpoint on a 40-vertex graph
    got = {r.vertex: r.width for r in
           widest_paths(e, [0, 7], max_supersteps=40, capacity_col="w").collect()}
    assert got == maximin([0, 7])


def test_widest_paths_early_stop_is_fixpoint(spark):
    from split_merge_partitioner_spark.graph.sssp import widest_paths

    rows = [(i, i + 1, (i % 3) + 1) for i in range(12)]
    e = spark.createDataFrame(rows, "src long, dst long, w long")
    a = {r.vertex: r.width for r in
         widest_paths(e, [0], max_supersteps=50, capacity_col="w").collect()}
    b = {r.vertex: r.width for r in
         widest_paths(e, [0], max_supersteps=13, capacity_col="w").collect()}
    assert a == b
