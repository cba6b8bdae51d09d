"""wl_colors (graph/wl.py) vs a pure-Python splitmix64 replay and the
classic 1-WL distinguishability facts."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.graph import wl_colors

M64 = (1 << 64) - 1
M63 = (1 << 63) - 1


def _sm64(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def _wl_replay(pairs, n_rounds):
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    c = {v: _sm64(len(ns)) for v, ns in adj.items()}
    for _ in range(n_rounds):
        c = {
            v: _sm64((c[v] + sum(_sm64(c[u]) for u in adj[v])) & M64)
            for v in adj
        }
    return {v: x & M63 for v, x in c.items()}


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_wl_matches_python_replay(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=120, m_per_node=4, seed=5)
    pairs = list(zip((int(x) for x in pdf["src"]), (int(x) for x in pdf["dst"])))
    got = {r.vertex: r.color for r in wl_colors(spark.createDataFrame(pdf), 3).collect()}
    assert got == _wl_replay(pairs, 3)


def test_wl_refines_path_and_stabilizes_cycle(spark):
    # P4 (path 1-2-3-4): endpoints vs middles split at round 0 (degree);
    # C6: vertex-transitive -> one color forever
    p4 = _df(spark, [(1, 2), (2, 3), (3, 4)])
    out = {r.vertex: r.color for r in wl_colors(p4, 2).collect()}
    assert out[1] == out[4] and out[2] == out[3] and out[1] != out[2]
    c6 = _df(spark, [(i, (i + 1) % 6) for i in range(6)])
    assert len({r.color for r in wl_colors(c6, 3).collect()}) == 1


def test_wl_cannot_split_c6_from_two_triangles(spark):
    # the canonical 1-WL blind spot: C6 and 2xC3 are both 2-regular and
    # refine to the SAME single color — document the limitation as a test
    c6 = _df(spark, [(i, (i + 1) % 6) for i in range(6)])
    tt = _df(spark, [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)])
    c1 = {r.color for r in wl_colors(c6, 3).collect()}
    c2 = {r.color for r in wl_colors(tt, 3).collect()}
    assert c1 == c2 and len(c1) == 1


def test_wl_zero_rounds_is_degree_hash(spark):
    star = _df(spark, [(0, 1), (0, 2), (0, 3)])
    out = {r.vertex: r.color for r in wl_colors(star, 0).collect()}
    assert out[0] == _sm64(3) & M63
    assert out[1] == out[2] == out[3] == _sm64(1) & M63
    with pytest.raises(ValueError):
        wl_colors(star, -1)
