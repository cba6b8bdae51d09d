"""Bridge/2-edge-component tests: equality with a pure-Python Tarjan bridge
finder over random graphs (both paths), dense/shuffle parity, and
hand-built topologies (trees, cycles, barbells, forests)."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph.bridges import bridges, two_edge_components


def _tarjan_bridges(n_vertices, rows):
    adj: dict[int, list[tuple[int, int]]] = {}
    for i, (a, b, *_s) in enumerate(rows):
        adj.setdefault(a, []).append((b, i))
        adj.setdefault(b, []).append((a, i))
    disc, low = {}, {}
    out = set()
    timer = [0]
    for start in adj:
        if start in disc:
            continue
        stack = [(start, -1, iter(adj[start]))]
        disc[start] = low[start] = timer[0]
        timer[0] += 1
        while stack:
            v, pe, it = stack[-1]
            advanced = False
            for u, ei in it:
                if ei == pe:
                    continue
                if u not in disc:
                    disc[u] = low[u] = timer[0]
                    timer[0] += 1
                    stack.append((u, ei, iter(adj[u])))
                    advanced = True
                    break
                low[v] = min(low[v], disc[u])
            if not advanced:
                stack.pop()
                if stack:
                    p, _, _ = stack[-1]
                    low[p] = min(low[p], low[v])
                    if low[v] > disc[p]:
                        out.add((min(p, v), max(p, v)))
    return out


def _rand_graph(seed, n=40, m=60):
    rng = random.Random(seed)
    seen, rows = set(), []
    while len(rows) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        rows.append((a, b))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _flags(df):
    return {(r.src, r.dst): r.is_bridge for r in df.collect()}


def test_bridges_match_tarjan_dense(spark):
    for seed in (1, 2, 5):
        rows = _rand_graph(seed)
        got, info = bridges(_df(spark, rows))
        assert info["mode"] == "dense"
        exp = _tarjan_bridges(40, rows)
        assert {e for e, f in _flags(got).items() if f} == exp


def test_bridges_shuffle_parity(spark):
    rows = _rand_graph(9, n=25, m=35)
    dense, _ = bridges(_df(spark, rows))
    shuf, info = bridges(_df(spark, rows), dense_threshold=0)
    assert info["mode"] == "shuffle"
    assert _flags(dense) == _flags(shuf)
    assert {e for e, f in _flags(shuf).items() if f} == _tarjan_bridges(25, rows)


def test_bridges_topologies(spark):
    # pure tree: every edge a bridge
    tree = [(0, 1), (1, 2), (1, 3), (3, 4)]
    got, _ = bridges(_df(spark, tree))
    assert all(_flags(got).values())
    # single cycle: no bridges
    cyc = [(0, 1), (1, 2), (2, 3), (0, 3)]
    got, _ = bridges(_df(spark, cyc))
    assert not any(_flags(got).values())
    # barbell: two triangles + connecting edge -> only the connector
    barb = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got, _ = bridges(_df(spark, barb))
    fl = _flags(got)
    assert fl[(2, 3)] and sum(fl.values()) == 1
    # disconnected forest with one cycle
    mix = [(0, 1), (10, 11), (11, 12), (10, 12), (12, 13)]
    got, _ = bridges(_df(spark, mix))
    fl = _flags(got)
    assert fl[(0, 1)] and fl[(12, 13)]
    assert not (fl[(10, 11)] or fl[(11, 12)] or fl[(10, 12)])


def test_two_edge_components(spark):
    # barbell: triangles collapse to their min vertex; the bridge separates
    barb = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    out, _ = two_edge_components(_df(spark, barb))
    comp = {r.vertex: r.component for r in out.collect()}
    assert comp[0] == comp[1] == comp[2] == 0
    assert comp[3] == comp[4] == comp[5] == 3
    rows = _rand_graph(3, n=30, m=40)
    out, _ = two_edge_components(_df(spark, rows))
    exp_bridges = _tarjan_bridges(30, rows)
    comp = {r.vertex: r.component for r in out.collect()}
    # endpoints of every bridge land in different 2ecc; non-bridge edges same
    for a, b in rows:
        if (a, b) in exp_bridges:
            assert comp[a] != comp[b]
