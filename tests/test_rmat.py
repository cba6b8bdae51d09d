"""rmat_edges (sources/rmat.py) vs a pure-Python splitmix64 replay plus the
R-MAT shape facts (skew, vertex range, determinism, validation)."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.sources import rmat_edges

M64 = (1 << 64) - 1
M63 = (1 << 63) - 1
GOLD = 0x9E3779B97F4A7C15


def _sm64(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def _replay(scale, edge_factor, a, b, c, seed):
    out = []
    for e in range(edge_factor * (1 << scale)):
        he = _sm64((e + seed) & M64)
        src = dst = 0
        for lvl in range(scale):
            r = (_sm64((he + (lvl + 1) * GOLD) & M64) & M63) % 1_000_000
            if r >= a + b:
                src |= 1 << lvl
            if (a <= r < a + b) or r >= a + b + c:
                dst |= 1 << lvl
        out.append((e, src, dst))
    return out


def test_matches_python_replay(spark):
    got = sorted(
        tuple(r) for r in rmat_edges(spark, scale=6, edge_factor=4, seed=7).collect()
    )
    assert got == _replay(6, 4, 570_000, 190_000, 190_000, 7)


def test_vertex_range_and_count(spark):
    df = rmat_edges(spark, scale=8, edge_factor=2, seed=1)
    assert df.count() == 2 * 256
    row = df.selectExpr(
        "min(src) s0", "max(src) s1", "min(dst) d0", "max(dst) d1"
    ).collect()[0]
    assert 0 <= row.s0 and row.s1 < 256 and 0 <= row.d0 and row.d1 < 256


def test_powerlaw_skew(spark):
    # a=0.57 concentrates mass at low ids: the max out-degree must dwarf the
    # mean (the whole point of R-MAT vs uniform)
    df = rmat_edges(spark, scale=10, edge_factor=8, seed=3)
    degs = df.groupBy("src").count()
    row = degs.selectExpr("max(count) mx", "avg(count) av").collect()[0]
    assert row.mx > 6 * row.av


def test_uniform_ppm_is_unskewed(spark):
    # a=b=c=250000 (Erdos-Renyi corner): skew collapses
    df = rmat_edges(
        spark, scale=10, edge_factor=8, a_ppm=250_000, b_ppm=250_000,
        c_ppm=250_000, seed=3,
    )
    row = df.groupBy("src").count().selectExpr(
        "max(count) mx", "avg(count) av"
    ).collect()[0]
    assert row.mx < 4 * row.av


def test_partitioning_invariance(spark):
    a = rmat_edges(spark, scale=5, edge_factor=4, seed=9, num_partitions=1)
    b = rmat_edges(spark, scale=5, edge_factor=4, seed=9, num_partitions=7)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_validations(spark):
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=0)
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=4, edge_factor=0)
    with pytest.raises(ValueError):
        rmat_edges(spark, scale=4, a_ppm=900_000, b_ppm=200_000)


def test_lazy_requires_ansi_off(spark):
    was = spark.conf.get("spark.sql.ansi.enabled")
    try:
        spark.conf.set("spark.sql.ansi.enabled", "true")
        with pytest.raises(ValueError, match="ansi"):
            rmat_edges(spark, scale=4, lazy=True)
        spark.conf.set("spark.sql.ansi.enabled", "false")
        lazy = rmat_edges(spark, scale=4, edge_factor=2, seed=5, lazy=True)
        eager = rmat_edges(spark, scale=4, edge_factor=2, seed=5)
        assert sorted(map(tuple, lazy.collect())) == sorted(map(tuple, eager.collect()))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", was)


def test_restores_ansi_conf(spark):
    before = spark.conf.get("spark.sql.ansi.enabled")
    rmat_edges(spark, scale=4).count()
    assert spark.conf.get("spark.sql.ansi.enabled") == before
