"""ic_influence (graph/cascade.py) vs a pure-Python live-edge replay plus
the IC-model laws (p=0 / p=1e6 corners, monotonicity in seeds, leak guard,
validations)."""

from __future__ import annotations

from collections import deque

import pytest

from split_merge_partitioner_spark.graph import ic_influence

M64 = (1 << 64) - 1
M63 = (1 << 63) - 1


def _sm64(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def _replay(pairs, seeds, p_ppm, n_sims, seed):
    out = {}
    for s in range(n_sims):
        adj: dict[int, list[int]] = {}
        for u, v in pairs:
            h = _sm64((u * 1_000_003 + v * 40_503 + s * 2_654_435_761 + seed) & M64)
            if (h & M63) % 1_000_000 < p_ppm:
                adj.setdefault(u, []).append(v)
        seen = set(seeds)
        q = deque(seeds)
        while q:
            x = q.popleft()
            for y in adj.get(x, ()):
                if y not in seen:
                    seen.add(y)
                    q.append(y)
        out[s] = len(seen)
    return out


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_matches_python_replay(spark):
    pairs = [(v, (7 * v + 3) % 60) for v in range(60)] + [
        (v, (v + 1) % 60) for v in range(0, 60, 5)
    ]
    df = _df(spark, pairs)
    got = {
        r.sim: r.n_influenced
        for r in ic_influence(df, seeds=[0, 1], p_ppm=400_000, n_sims=6, seed=9).collect()
    }
    assert got == _replay(pairs, [0, 1], 400_000, 6, 9)


def test_p_zero_and_p_full(spark):
    # p=0: nothing fires -> influence = |seeds| in every sim;
    # p=1e6: everything fires -> influence = full reachable set
    pairs = [(i, i + 1) for i in range(10)]
    df = _df(spark, pairs)
    z = ic_influence(df, seeds=[0, 5], p_ppm=0, n_sims=3).collect()
    assert {r.n_influenced for r in z} == {2}
    f = ic_influence(df, seeds=[0], p_ppm=1_000_000, n_sims=2).collect()
    assert {r.n_influenced for r in f} == {11}


def test_monotone_in_seed_set(spark):
    pairs = [(v, (3 * v + 1) % 40) for v in range(40)]
    df = _df(spark, pairs)
    small = {
        r.sim: r.n_influenced
        for r in ic_influence(df, seeds=[0], p_ppm=500_000, n_sims=4).collect()
    }
    big = {
        r.sim: r.n_influenced
        for r in ic_influence(df, seeds=[0, 7, 21], p_ppm=500_000, n_sims=4).collect()
    }
    assert all(big[s] >= small[s] for s in small)


def test_validations(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        ic_influence(df, seeds=[])
    with pytest.raises(ValueError):
        ic_influence(df, seeds=[0], p_ppm=2_000_000)
    with pytest.raises(ValueError):
        ic_influence(df, seeds=[0], n_sims=0)


def test_no_net_storage_growth(spark):
    sc = spark.sparkContext
    df = _df(spark, [(i, i + 1) for i in range(15)])
    before = len(sc._jsc.sc().getRDDStorageInfo())
    ic_influence(df, seeds=[0], p_ppm=800_000, n_sims=3).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # only the per-sim result row table


# ---------------------------------------------------------------------------
# greedy influence maximization
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import influence_max


def _im_replay(pairs, k, n_candidates, p_ppm, n_sims, seed):
    """Pure-Python greedy max-coverage over deterministic live-edge sims."""
    arcs = sorted({(u, v) for u, v in pairs if u != v})
    outdeg: dict[int, int] = {}
    for u, _ in arcs:
        outdeg[u] = outdeg.get(u, 0) + 1
    cands = sorted(outdeg, key=lambda c: (-outdeg[c], c))[:n_candidates]
    cover: dict[int, set] = {}
    for s in range(n_sims):
        adj: dict[int, list[int]] = {}
        for u, v in arcs:
            h = _sm64((u * 1_000_003 + v * 40_503 + s * 2_654_435_761 + seed) & M64)
            if (h & M63) % 1_000_000 < p_ppm:
                adj.setdefault(u, []).append(v)
        for c in cands:
            seen = {c}
            q = deque([c])
            while q:
                x = q.popleft()
                for y in adj.get(x, ()):
                    if y not in seen:
                        seen.add(y)
                        q.append(y)
            cover.setdefault(c, set()).update((s, v) for v in seen)
    covered: set = set()
    rows = []
    chosen: list[int] = []
    for r in range(1, k + 1):
        remaining = [c for c in cands if c not in chosen]
        best = min(remaining, key=lambda c: (-len(cover[c] - covered), c))
        gain = len(cover[best] - covered)
        covered |= cover[best]
        chosen.append(best)
        rows.append((r, best, gain, len(covered)))
    return rows


def test_influence_max_matches_python_replay(spark):
    import numpy as np

    rng = np.random.default_rng(4)
    pairs = sorted({
        (int(a), int(b)) for a, b in rng.integers(0, 60, size=(150, 2)) if a != b
    })
    got = [
        tuple(r)
        for r in influence_max(
            _df(spark, pairs), k=3, n_candidates=8, p_ppm=400_000, n_sims=5, seed=11
        ).collect()
    ]
    assert got == _im_replay(pairs, 3, 8, 400_000, 5, 11)


def test_influence_max_p_full_two_stars(spark):
    # two disjoint out-stars: hub 0 -> 1..5, hub 10 -> 11..13; p=1e6 makes
    # cascades deterministic full reach; greedy must take the big hub then
    # the small one, never a leaf
    pairs = [(0, v) for v in range(1, 6)] + [(10, v) for v in range(11, 14)]
    out = influence_max(
        _df(spark, pairs), k=2, n_candidates=4, p_ppm=1_000_000, n_sims=3, seed=1
    ).collect()
    assert [r.seed_vertex for r in out] == [0, 10]
    assert out[0].marginal_gain == 6 * 3 and out[1].marginal_gain == 4 * 3
    assert out[1].covered_pairs == 10 * 3


def test_influence_max_overlap_prefers_marginal(spark):
    # hub 0 covers 1..6; hub 1 covers 2..6 (subset once 0 chosen) while hub
    # 10 covers a disjoint pair — round 2 must prefer the DISJOINT smaller
    # spread over the larger-but-covered one
    pairs = (
        [(0, v) for v in range(1, 7)]
        + [(1, v) for v in range(2, 7)]
        + [(10, 11), (10, 12)]
    )
    out = influence_max(
        _df(spark, pairs), k=2, n_candidates=3, p_ppm=1_000_000, n_sims=2, seed=5
    ).collect()
    assert [r.seed_vertex for r in out] == [0, 10]


def test_influence_max_validations(spark):
    df = _df(spark, [(1, 2), (2, 3)])
    with pytest.raises(ValueError):
        influence_max(df, k=0)
    with pytest.raises(ValueError):
        influence_max(df, k=5, n_candidates=3)
    with pytest.raises(ValueError):
        influence_max(df, k=3, n_candidates=3)  # only 2 candidates exist
    with pytest.raises(ValueError):
        influence_max(df, k=1, p_ppm=-1)
