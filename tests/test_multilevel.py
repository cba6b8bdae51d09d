"""multilevel_partition (operators/multilevel.py): conservation, balance,
clustered-graph quality vs random labels, determinism, degenerate inputs."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.operators import multilevel_partition


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _cut_fraction(pairs, labels):
    lab = dict(labels)
    cut = sum(1 for a, b in pairs if lab[a] != lab[b])
    return cut / len(pairs)


def test_every_vertex_labeled_in_range(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=120, m_per_node=3, seed=7)
    df = spark.createDataFrame(pdf)
    out, info = multilevel_partition(df, k=4, levels=2, rounds=4)
    rows = out.collect()
    verts = set(pdf["src"]) | set(pdf["dst"])
    assert {r.vertex for r in rows} == verts
    assert all(0 <= r.label < 4 for r in rows)
    assert info["levels_run"] >= 1
    # coarsening must actually shrink
    li = info["level_info"][0]
    assert li["m_after"] < li["m_before"]


def test_two_cliques_bridge_low_cut(spark):
    # two K6 cliques + one bridge: the multilevel scheme should keep each
    # clique (heavy intra edges contract first) — cut fraction well below
    # the random-labels expectation (1/2 for k=2)
    k1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    k2 = [(10 + i, 10 + j) for i in range(6) for j in range(i + 1, 6)]
    pairs = k1 + k2 + [(0, 10)]
    out, _ = multilevel_partition(_df(spark, pairs), k=2, levels=2, rounds=6)
    lab = [(r.vertex, r.label) for r in out.collect()]
    assert _cut_fraction(pairs, lab) <= 0.2


def test_repartition_determinism(spark):
    pairs = [(i, (i * 5 + 2) % 60) for i in range(60) if i != (i * 5 + 2) % 60]
    a, _ = multilevel_partition(_df(spark, pairs).repartition(1), k=3, levels=2)
    b, _ = multilevel_partition(_df(spark, pairs).repartition(7), k=3, levels=2)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_full_contraction_backfills(spark):
    # a single edge contracts to one supervertex with no coarse edges:
    # labels backfill deterministically, still in range
    out, info = multilevel_partition(_df(spark, [(0, 1)]), k=2, levels=3)
    rows = {r.vertex: r.label for r in out.collect()}
    assert set(rows) == {0, 1} and all(0 <= v < 2 for v in rows.values())


def test_validations(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        multilevel_partition(df, k=1)
    with pytest.raises(ValueError):
        multilevel_partition(df, k=2, levels=0)


def test_no_net_storage_growth(spark):
    sc = spark.sparkContext
    pairs = [(i, (i + 1) % 30) for i in range(30)]
    before = len(sc._jsc.sc().getRDDStorageInfo())
    out, _ = multilevel_partition(_df(spark, pairs), k=2, levels=2)
    out.collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # only the result labels stay live
