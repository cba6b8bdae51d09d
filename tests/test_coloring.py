"""Jones-Plassmann greedy coloring (graph/coloring.py): propriety and
greedy-bound invariants on structured graphs, an independent Python
round-replay, determinism under repartitioning, and the fail-fast path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph import greedy_coloring

M31 = 2147483647


def _lehmer(v: int, seed: int) -> int:
    h = ((v % M31 + M31) % M31 + (seed % M31) + 1) % M31
    return ((h * 48271) % M31 + 1) * 69621 % M31


def _python_jp(edge_list, seed=42):
    """Independent round-for-round Jones-Plassmann replay."""
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    pr = {v: _lehmer(v, seed) for v in adj}
    color: dict[int, int] = {}
    rounds: dict[int, int] = {}
    uncolored = set(adj)
    r = 0
    while uncolored:
        r += 1
        ready = [
            v for v in uncolored
            if not any(
                (pr[nb], nb) > (pr[v], v) for nb in adj[v] if nb in uncolored
            )
        ]
        assert ready, "JP must make progress every round"
        for v in ready:
            used = {color[nb] for nb in adj[v] if nb in color}
            c = 1
            while c in used:
                c += 1
            color[v] = c
            rounds[v] = r
        uncolored -= set(ready)
    return color, rounds


def _edges_df(spark, edge_list):
    return spark.createDataFrame(edge_list, "src long, dst long")


def test_coloring_matches_python_replay(spark):
    # two 25-vertex functional blocks + chords — the oracle fixture's shape
    edge_list = [(v, (v // 25) * 25 + (3 * (v % 25) + 1) % 25) for v in range(50)]
    edge_list += [(v, (v // 25) * 25 + (7 * (v % 25) + 2) % 25) for v in range(0, 50, 5)]
    edge_list = [(a, b) for a, b in edge_list if a != b]
    out, info = greedy_coloring(_edges_df(spark, edge_list))
    got = {(r.vertex): (r.color, r.round_colored) for r in out.collect()}
    color, rounds = _python_jp(edge_list)
    assert got == {v: (color[v], rounds[v]) for v in color}
    assert info["converged"] and info["n_colors"] == max(color.values())


def test_coloring_proper_and_greedy_bound(spark):
    # K5 plus a long path: chromatic pressure + depth
    edge_list = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edge_list += [(i, i + 1) for i in range(5, 40)]
    edge_list += [(0, 5)]
    e = _edges_df(spark, edge_list)
    out, info = greedy_coloring(e)
    col = {r.vertex: r.color for r in out.collect()}
    deg: dict[int, int] = {}
    for a, b in edge_list:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    for a, b in edge_list:
        assert col[a] != col[b]
        assert col[a] <= deg[a] + 1 and col[b] <= deg[b] + 1
    assert info["n_colors"] >= 5  # K5 needs 5 colors


def test_coloring_deterministic_under_repartition(spark):
    edge_list = [(i, (i * 3 + 1) % 60) for i in range(60) if i != (i * 3 + 1) % 60]
    a, _ = greedy_coloring(_edges_df(spark, edge_list))
    b, _ = greedy_coloring(_edges_df(spark, edge_list).repartition(7, "dst"))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()


def test_coloring_edgeless_and_failfast(spark):
    out, info = greedy_coloring(
        spark.createDataFrame([], "src long, dst long")
    )
    assert out.count() == 0 and info["converged"]
    # a 40-path needs more than 2 JP rounds under any priorities
    path = [(i, i + 1) for i in range(40)]
    with pytest.raises(RuntimeError, match="not converged"):
        greedy_coloring(_edges_df(spark, path), max_rounds=2)
