"""Bond-percolation robustness profile: each level's component stats must
equal a from-scratch union-find over the edges whose deterministic coin
clears that level's threshold; levels are nested, monotone, and the
p=1e6 row must match the full graph's component structure."""

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import bond_percolation_profile
from split_merge_partitioner_spark.graph.robustness import _MASK63, _P1, _P2
from split_merge_partitioner_spark.graph.hyperanf import splitmix64


def _coin(u, v, seed):
    a, b = (u, v) if u < v else (v, u)
    x = np.array([(a * _P1 + b * _P2 + seed) & ((1 << 64) - 1)], dtype=np.uint64)
    return (int(splitmix64(x)[0]) & _MASK63) % 1_000_000


def _union_find_stats(n_vertices, pairs):
    parent = {v: v for v in n_vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in pairs:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    roots = {}
    for v in parent:
        roots.setdefault(find(v), []).append(v)
    sizes = [len(m) for m in roots.values()]
    return {
        "n_components": len(sizes),
        "giant_size": max(sizes),
        "n_isolated": sum(1 for s in sizes if s == 1),
    }


def _random_edges(seed, n=150, m=260):
    rng = np.random.default_rng(seed)
    return sorted({
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, n, size=(m, 2))
        if a != b
    })


@pytest.mark.parametrize("seed", [1, 7])
def test_profile_matches_per_level_recompute(spark, seed):
    pairs = _random_edges(seed)
    verts = sorted({v for e in pairs for v in e})
    levels = [50_000, 200_000, 500_000, 1_000_000]
    df = spark.createDataFrame(pairs, "src long, dst long")
    prof, info = bond_percolation_profile(df, levels, seed=seed)
    got = {r.p_ppm: r.asDict() for r in prof.collect()}
    assert set(got) == set(levels)
    for p in levels:
        retained = [e for e in pairs if _coin(*e, seed) < p]
        exp = _union_find_stats(verts, retained)
        row = got[p]
        assert row["n_edges"] == len(retained), p
        for k, v in exp.items():
            assert row[k] == v, (p, k, row, exp)
        assert info["levels"][p]["rounds"] >= 0
    # full-retention row covers every edge and the true component structure
    assert got[1_000_000]["n_edges"] == len(pairs)
    # monotone curve: edges/giant nondecreasing, components nonincreasing
    seq = [got[p] for p in levels]
    for a, b in zip(seq, seq[1:]):
        assert a["n_edges"] <= b["n_edges"]
        assert a["giant_size"] <= b["giant_size"]
        assert a["n_components"] >= b["n_components"]


def test_profile_deterministic_under_repartition(spark):
    pairs = _random_edges(3)
    df = spark.createDataFrame(pairs, "src long, dst long")
    a, _ = bond_percolation_profile(df, [100_000, 600_000], seed=9)
    b, _ = bond_percolation_profile(df.repartition(13), [600_000, 100_000], seed=9)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_profile_counts_isolated_vertices_of_original_graph(spark):
    # a level retaining zero edges must report every vertex as a singleton
    pairs = [(1, 2), (2, 3), (10, 11)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    prof, _ = bond_percolation_profile(df, [0, 1_000_000], seed=4)
    rows = {r.p_ppm: r for r in prof.collect()}
    assert rows[0].n_edges == 0
    assert rows[0].n_components == 5
    assert rows[0].n_isolated == 5
    assert rows[0].giant_size == 1
    assert rows[1_000_000].n_components == 2
    assert rows[1_000_000].giant_size == 3
    assert rows[1_000_000].n_isolated == 0


def test_profile_rejects_bad_levels(spark):
    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        bond_percolation_profile(df, [])
    with pytest.raises(ValueError):
        bond_percolation_profile(df, [-1])
    with pytest.raises(ValueError):
        bond_percolation_profile(df, [2_000_000])


# ---------------------------------------------------------------------------
# targeted-attack profile
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import targeted_attack_profile


def _attack_expected(pairs, k):
    """Union-find recompute after removing the top-k (degree DESC, vertex
    ASC) vertices of the canonical graph."""
    deg = {}
    for a, b in pairs:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(deg, key=lambda v: (-deg[v], v))
    removed = set(order[:k])
    alive = [v for v in deg if v not in removed]
    retained = [e for e in pairs if e[0] not in removed and e[1] not in removed]
    stats = _union_find_stats(alive, retained) if alive else {
        "n_components": 0, "giant_size": None, "n_isolated": 0,
    }
    stats["n_edges"] = len(retained)
    stats["n_vertices"] = len(alive)
    return stats


@pytest.mark.parametrize("seed", [2, 11])
def test_attack_matches_per_level_recompute(spark, seed):
    pairs = _random_edges(seed)
    ks = [0, 5, 20, 60]
    df = spark.createDataFrame(pairs, "src long, dst long")
    prof, info = targeted_attack_profile(df, ks)
    got = {r.n_removed: r.asDict() for r in prof.collect()}
    assert set(got) == set(ks)
    for k in ks:
        exp = _attack_expected(pairs, k)
        row = got[k]
        for key, v in exp.items():
            assert row[key] == v, (k, key, row, exp)
    # k=0 row is the intact graph
    assert got[0]["n_edges"] == len(pairs)
    # attack curve: more removals, fewer edges, smaller giant
    seq = [got[k] for k in ks]
    for a, b in zip(seq, seq[1:]):
        assert a["n_edges"] >= b["n_edges"]
        assert a["giant_size"] >= b["giant_size"]


def test_attack_hand_star(spark):
    # star 1-(2..6) plus a detached triangle (10,11,12): removing the single
    # top hub (vertex 1, degree 5) shatters the star into 5 isolated leaves
    pairs = [(1, v) for v in range(2, 7)] + [(10, 11), (11, 12), (10, 12)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    prof, _ = targeted_attack_profile(df, [0, 1])
    rows = {r.n_removed: r for r in prof.collect()}
    assert rows[0].n_components == 2
    assert rows[0].giant_size == 6
    assert rows[1].n_vertices == 8
    assert rows[1].n_edges == 3
    assert rows[1].n_components == 6
    assert rows[1].giant_size == 3
    assert rows[1].n_isolated == 5


def test_attack_deterministic_and_validates(spark):
    pairs = _random_edges(5)
    df = spark.createDataFrame(pairs, "src long, dst long")
    a, _ = targeted_attack_profile(df, [3, 30])
    b, _ = targeted_attack_profile(df.repartition(7), [30, 3])
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    with pytest.raises(ValueError):
        targeted_attack_profile(df, [])
    with pytest.raises(ValueError):
        targeted_attack_profile(df, [-2])
    with pytest.raises(ValueError):
        targeted_attack_profile(df, [10_000])
