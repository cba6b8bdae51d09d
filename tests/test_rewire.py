"""configuration_rewire (graph/rewire.py) vs a pure-Python stub-matching
replay plus the configuration-model laws (degree preservation, seed
sensitivity, repartition determinism)."""

from __future__ import annotations

from collections import Counter

from split_merge_partitioner_spark.graph import configuration_rewire

M64 = (1 << 64) - 1
M63 = (1 << 63) - 1


def _sm64(z: int) -> int:
    z = (z + 0x9E3779B97F4A7C15) & M64
    z = ((z ^ (z >> 30)) * 0xBF58476D1CE4E5B9) & M64
    z = ((z ^ (z >> 27)) * 0x94D049BB133111EB) & M64
    return z ^ (z >> 31)


def _replay(pairs, seed):
    stubs = []
    for s, d in pairs:
        for side, v in ((0, s), (1, d)):
            h = _sm64((s * 1_000_003 + d * 40_503 + side + seed) & M64) & M63
            stubs.append((h, s, d, side, v))
    stubs.sort()
    return [
        (i // 2, stubs[i][4], stubs[i + 1][4]) for i in range(0, len(stubs), 2)
    ]


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_matches_python_replay(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=80, m_per_node=3, seed=2)
    pairs = list(zip((int(x) for x in pdf["src"]), (int(x) for x in pdf["dst"])))
    got = sorted(
        tuple(r) for r in configuration_rewire(spark.createDataFrame(pdf), 7).collect()
    )
    assert got == sorted(_replay(pairs, 7))


def test_degree_sequence_preserved(spark):
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (4, 5)]
    rw = configuration_rewire(_df(spark, pairs), seed=3).collect()
    before = Counter()
    for a, b in pairs:
        before[a] += 1
        before[b] += 1
    after = Counter()
    for r in rw:
        after[r.src] += 1
        after[r.dst] += 1
    assert after == before
    assert len(rw) == len(pairs)


def test_seed_changes_wiring(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    df = spark.createDataFrame(powerlaw_edges_pdf(n=60, m_per_node=3, seed=1))
    a = sorted((r.src, r.dst) for r in configuration_rewire(df, seed=1).collect())
    b = sorted((r.src, r.dst) for r in configuration_rewire(df, seed=2).collect())
    assert a != b


def test_repartition_determinism(spark):
    pairs = [(i, (i * 3 + 1) % 40) for i in range(40) if i != (i * 3 + 1) % 40]
    d1 = _df(spark, pairs).repartition(1)
    d2 = _df(spark, pairs).repartition(7)
    a = sorted(tuple(r) for r in configuration_rewire(d1, seed=5).collect())
    b = sorted(tuple(r) for r in configuration_rewire(d2, seed=5).collect())
    assert a == b


def test_restores_ansi(spark):
    before = spark.conf.get("spark.sql.ansi.enabled")
    configuration_rewire(_df(spark, [(0, 1)]), seed=1).collect()
    assert spark.conf.get("spark.sql.ansi.enabled") == before


def test_triangle_significance_clique_plus_chain(spark):
    from split_merge_partitioner_spark.graph import triangle_significance

    # K5 (10 triangles) plus a long chain: observed = 10; the null graph is
    # data-dependent but deterministic, and excess must equal the difference
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    pairs += [(100 + i, 101 + i) for i in range(30)]
    row = triangle_significance(_df(spark, pairs), seed=4).collect()[0]
    assert row.n_triangles_observed == 10
    assert row.excess == row.n_triangles_observed - row.n_triangles_null
    assert row.n_triangles_null >= 0


def test_triangle_significance_releases_scratch(spark):
    from split_merge_partitioner_spark.graph import triangle_significance

    sc = spark.sparkContext
    pairs = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6)]
    before = len(sc._jsc.sc().getRDDStorageInfo())
    triangle_significance(_df(spark, pairs), seed=2).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 0  # result is a createDataFrame, nothing persists
