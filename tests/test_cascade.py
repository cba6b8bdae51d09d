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
