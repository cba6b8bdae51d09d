"""Borůvka MSF tests: equality with a driver-side Kruskal union-find under
the same (w, src, dst) total order, dense/shuffle path parity, forest
invariants, and duplicate-weight determinism."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph.mst import boruvka_msf


def _kruskal(rows):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = []
    for w, s, d in sorted((w, s, d) for s, d, w in rows):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            out.append((s, d, w))
    return sorted(out)


def _rand_graph(seed, n=60, m=150, wmax=20):
    rng = random.Random(seed)
    seen = set()
    rows = []
    while len(rows) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        rows.append((a, b, rng.randrange(1, wmax)))  # many duplicate weights
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, w long")


def test_boruvka_matches_kruskal_dense(spark):
    for seed in (1, 2, 3):
        rows = _rand_graph(seed)
        got, info = boruvka_msf(_df(spark, rows))
        assert info["mode"] == "dense"
        got_rows = sorted((r.src, r.dst, r.w) for r in got.collect())
        assert got_rows == _kruskal(rows)


def test_boruvka_shuffle_parity(spark):
    rows = _rand_graph(7, n=40, m=90)
    dense, _ = boruvka_msf(_df(spark, rows))
    shuf, info = boruvka_msf(_df(spark, rows), dense_threshold=0)
    assert info["mode"] == "shuffle"
    assert sorted(map(tuple, dense.collect())) == sorted(map(tuple, shuf.collect()))
    assert sorted(map(tuple, shuf.collect())) == _kruskal(rows)


def test_boruvka_disconnected_forest(spark):
    # two components + an isolated pair: forest has (n_i - 1) edges each
    rows = [(0, 1, 5), (1, 2, 5), (0, 2, 9), (10, 11, 1)]
    got, info = boruvka_msf(_df(spark, rows))
    assert sorted(map(tuple, got.collect())) == [(0, 1, 5), (1, 2, 5), (10, 11, 1)]


def test_boruvka_duplicate_weights_deterministic(spark):
    # all weights equal: the unique forest under (w, src, dst) order is the
    # lexicographically-least spanning tree; both paths and repeated runs agree
    rows = [(a, b, 7) for a in range(6) for b in range(a + 1, 6)]
    a1, _ = boruvka_msf(_df(spark, rows))
    a2, _ = boruvka_msf(_df(spark, rows), dense_threshold=0)
    exp = _kruskal(rows)
    assert sorted(map(tuple, a1.collect())) == exp
    assert sorted(map(tuple, a2.collect())) == exp


def test_boruvka_path_graph_long_chains(spark):
    # monotone-weight path: every component's min pointer aims the same way —
    # the adversarial case for label-propagation contraction; pointer
    # doubling must still resolve in O(log) steps, and rounds stay O(log n)
    nn = 65
    rows = [(i, i + 1, 100 + i) for i in range(nn)]
    got, info = boruvka_msf(_df(spark, rows))
    assert sorted(map(tuple, got.collect())) == sorted(rows)
    assert info["rounds"] <= 8


def test_boruvka_empty(spark):
    got, info = boruvka_msf(_df(spark, []).limit(0))
    assert got.count() == 0 and info["mode"] == "empty"
