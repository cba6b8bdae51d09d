"""fuzzy_twins (graph/fuzzytwins.py) vs a pure-Python LSH + exact-Jaccard
replay plus the precision/recall laws (exact twins always surface, verified
values exact, threshold respected)."""

from __future__ import annotations

from itertools import combinations

import pytest

from split_merge_partitioner_spark.graph import fuzzy_twins

M64 = (1 << 64) - 1
GOLD = 0x9E3779B97F4A7C15
H, B = 16, 8


def _sm64(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


M63 = (1 << 63) - 1


def _replay(pairs, min_ppm):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    sig = {}
    for v, ns in adj.items():
        sig[v] = [
            min(_sm64((u + (i + 1) * GOLD) & M64) & M63 for u in ns)
            for i in range(H)
        ]
    r = H // B
    buckets: dict[tuple, list] = {}
    for v, s in sig.items():
        for b in range(B):
            h = _sm64(s[b * r] & M64)
            for j in range(1, r):
                h = _sm64((s[b * r + j] + h) & M64)
            buckets.setdefault((b, h), []).append(v)
    cand = set()
    for vs in buckets.values():
        for a, b in combinations(sorted(vs), 2):
            cand.add((a, b))
    out = {}
    for a, b in cand:
        c = len(adj[a] & adj[b])
        if not c:
            continue
        jp = 1_000_000 * c // (len(adj[a]) + len(adj[b]) - c)
        if jp >= min_ppm:
            out[(a, b)] = (c, len(adj[a]), len(adj[b]), jp)
    return out


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_matches_python_replay(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=80, m_per_node=4, seed=5)
    pairs = list(zip((int(x) for x in pdf["src"]), (int(x) for x in pdf["dst"])))
    # plant a near-mirror pod: x/y share 4 of 5 neighbors (jaccard 4/6)
    pairs += [(500, t) for t in (0, 1, 2, 3, 10)]
    pairs += [(501, t) for t in (0, 1, 2, 3, 11)]
    got = {
        (r.a, r.b): (r.n_common, r.deg_a, r.deg_b, r.jaccard_ppm)
        for r in fuzzy_twins(_df(spark, pairs), min_jaccard_ppm=300_000).collect()
    }
    assert got == _replay(pairs, 300_000)
    assert got[(500, 501)][3] == 1_000_000 * 4 // 6


def test_exact_twins_always_surface(spark):
    # identical neighbor sets -> identical signatures -> all bands match,
    # jaccard exactly 1e6
    pairs = [(100, t) for t in (0, 1, 2)] + [(101, t) for t in (0, 1, 2)]
    got = {
        (r.a, r.b): r.jaccard_ppm
        for r in fuzzy_twins(_df(spark, pairs), min_jaccard_ppm=900_000).collect()
    }
    assert got[(100, 101)] == 1_000_000


def test_threshold_respected(spark):
    pairs = [(100, t) for t in (0, 1, 2, 3)] + [(101, t) for t in (0, 4, 5, 6)]
    # jaccard(100,101) = 1/7 ~ 142857 ppm
    out = fuzzy_twins(_df(spark, pairs), min_jaccard_ppm=200_000).collect()
    assert all((r.a, r.b) != (100, 101) for r in out)
    out2 = {
        (r.a, r.b): r.jaccard_ppm
        for r in fuzzy_twins(_df(spark, pairs), min_jaccard_ppm=0).collect()
    }
    if (100, 101) in out2:  # only if a band happened to collide (recall, not precision)
        assert out2[(100, 101)] == 142857


def test_validation_and_ansi_restore(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        fuzzy_twins(df, min_jaccard_ppm=2_000_000)
    before = spark.conf.get("spark.sql.ansi.enabled")
    fuzzy_twins(df).collect()
    assert spark.conf.get("spark.sql.ansi.enabled") == before


def test_no_net_storage_growth(spark):
    sc = spark.sparkContext
    pairs = [(100, t) for t in range(3)] + [(101, t) for t in range(3)]
    before = len(sc._jsc.sc().getRDDStorageInfo())
    fuzzy_twins(_df(spark, pairs)).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1
