"""harmonic_closeness: exact replay against a textbook BFS, truncation
semantics, disconnected zeros, and the lcm-numerator exactness contract."""

from __future__ import annotations

import math
from collections import deque

import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph import harmonic_closeness


def _bfs(adj: dict[int, set[int]], s: int) -> dict[int, int]:
    dist = {s: 0}
    q = deque([s])
    while q:
        u = q.popleft()
        for w in adj.get(u, ()):  # noqa: B905
            if w not in dist:
                dist[w] = dist[u] + 1
                q.append(w)
    return dist


def _expected(edges, seeds, max_dist):
    adj: dict[int, set[int]] = {}
    verts = set()
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
        verts |= {a, b}
    big_l = math.lcm(*range(1, max_dist + 1))
    out = {}
    for v in verts:
        n = sd = num = 0
        for s in seeds:
            d = _bfs(adj, s).get(v)
            if d is not None and 1 <= d <= max_dist:
                n += 1
                sd += d
                num += big_l // d
        out[v] = (n, sd, num, round(num / big_l, 6))
    return out


PATH = [(0, 1), (1, 2), (2, 3), (3, 4)]
STAR = [(0, i) for i in range(1, 6)]
TWO_COMP = [(0, 1), (1, 2), (10, 11)]


@pytest.mark.parametrize(
    "edges,seeds",
    [(PATH, [0]), (PATH, [0, 4]), (STAR, [3]), (TWO_COMP, [0, 10]), (TWO_COMP, [2])],
)
def test_harmonic_exact_replay(spark, edges, seeds):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {
        r["vertex"]: (r["n_seeds_reached"], r["sum_dist"], r["harmonic_num"], r["harmonic"])
        for r in harmonic_closeness(df, seeds, max_dist=8).collect()
    }
    exp = _expected(edges, seeds, 8)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v][:3] == exp[v][:3], (v, got[v], exp[v])
        assert got[v][3] == pytest.approx(exp[v][3], abs=1e-9)


def test_harmonic_truncation_is_exact_horizon(spark):
    """max_dist=2 on a 5-path: vertices beyond 2 hops from the seed simply
    don't count — the documented HyperBall-style horizon."""
    df = spark.createDataFrame(PATH, "src long, dst long")
    got = {r["vertex"]: r for r in harmonic_closeness(df, [0], max_dist=2).collect()}
    assert got[1]["harmonic_num"] == 2 and got[2]["harmonic_num"] == 1  # L=lcm(1,2)=2
    assert got[3]["n_seeds_reached"] == 0 and got[4]["harmonic"] == 0.0


def test_harmonic_disconnected_and_self(spark):
    """Seeds score their OWN row zero (d=0 excluded) and cross-component
    distances contribute nothing — harmonic stays finite by construction."""
    df = spark.createDataFrame(TWO_COMP, "src long, dst long")
    got = {r["vertex"]: r for r in harmonic_closeness(df, [0], max_dist=8).collect()}
    assert got[0]["n_seeds_reached"] == 0  # self excluded
    assert got[10]["n_seeds_reached"] == 0 and got[11]["harmonic"] == 0.0
    assert got[1]["n_seeds_reached"] == 1


def test_harmonic_num_is_integer_exact(spark):
    """The numerator is BIGINT end to end: on a star from the hub every leaf
    is at d=1, so harmonic_num == L exactly (no float residue)."""
    df = spark.createDataFrame(STAR, "src long, dst long")
    big_l = math.lcm(*range(1, 9))
    got = {r["vertex"]: r for r in harmonic_closeness(df, [0], max_dist=8).collect()}
    for leaf in range(1, 6):
        assert got[leaf]["harmonic_num"] == big_l
        assert got[leaf]["harmonic"] == 1.0


def test_harmonic_missing_seed_and_validation(spark):
    df = spark.createDataFrame(PATH, "src long, dst long")
    # a seed absent from the graph contributes nothing but doesn't error
    got = {r["vertex"]: r for r in harmonic_closeness(df, [0, 999], max_dist=4).collect()}
    assert 999 not in got and got[1]["n_seeds_reached"] == 1
    with pytest.raises(ValueError):
        harmonic_closeness(df, [], max_dist=4)
    with pytest.raises(ValueError):
        harmonic_closeness(df, [0], max_dist=0)


# ---------------------------------------------------------------------------
# effective diameter
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import effective_diameter


def _eff_replay(pairs, seeds, q_ppm, max_dist):
    from collections import deque

    adj: dict[int, set] = {}
    for a, b in {(a, b) for a, b in pairs if a != b}:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    hist: dict[int, int] = {}
    for s in sorted(set(seeds)):
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= max_dist:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        for d in dist.values():
            hist[d] = hist.get(d, 0) + 1
    total = sum(hist.values())
    target = q_ppm / 1_000_000.0 * total
    cum = prev = t = 0
    for d in sorted(hist):
        prev = cum
        cum += hist[d]
        t = d
        if cum >= target:
            break
    return max(0.0, t - 1 + (target - prev) / (cum - prev)), t, total


def test_effective_diameter_path_graph(spark):
    # P11 from one end seed: distances 0..10 uniform, 90% point = 9.0 exactly
    pairs = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    row = effective_diameter(df, seeds=[0], q_ppm=900_000, max_dist=16).collect()[0]
    # cum at t: t+1 of 11 pairs; target 9.9 -> t=9 (cum 10), prev 9 -> 8 + 0.9
    assert row.eff_diameter == pytest.approx(8.9, abs=1e-9)
    assert row.t_ceil == 9 and row.n_pairs == 11


def test_effective_diameter_matches_python_replay(spark):
    import numpy as np

    rng = np.random.default_rng(17)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, size=(90, 2)) if a != b})
    seeds = [0, 5, 9, 13]
    df = spark.createDataFrame(pairs, "src long, dst long")
    row = effective_diameter(df, seeds=seeds, q_ppm=900_000, max_dist=8).collect()[0]
    eff, t, total = _eff_replay(pairs, seeds, 900_000, 8)
    assert row.eff_diameter == pytest.approx(round(eff, 6), abs=1e-9)
    assert (row.t_ceil, row.n_pairs) == (t, total)


def test_effective_diameter_full_quantile_hits_eccentricity(spark):
    # q = 100%: the interpolation lands exactly on the deepest radius
    pairs = [(i, i + 1) for i in range(5)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    row = effective_diameter(df, seeds=[0], q_ppm=1_000_000, max_dist=16).collect()[0]
    assert row.eff_diameter == 5.0 and row.t_ceil == 5


def test_effective_diameter_validations(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        effective_diameter(df, seeds=[])
    with pytest.raises(ValueError):
        effective_diameter(df, seeds=[0], q_ppm=0)
    with pytest.raises(ValueError):
        effective_diameter(df, seeds=[0], max_dist=0)
