"""dyad_census (graph/census.py) and graph_fingerprint (graph/wl.py) vs
pure-Python replays and the textbook invariants."""

from __future__ import annotations

from itertools import combinations

from split_merge_partitioner_spark.graph import dyad_census, graph_fingerprint

M64 = (1 << 64) - 1
M63 = (1 << 63) - 1


def _dyad_replay(arcs):
    arcs = {(a, b) for a, b in arcs if a != b}
    verts = {v for e in arcs for v in e}
    mutual = asym = 0
    for a, b in combinations(sorted(verts), 2):
        fwd, rev = (a, b) in arcs, (b, a) in arcs
        if fwd and rev:
            mutual += 1
        elif fwd or rev:
            asym += 1
    n = len(verts)
    null = n * (n - 1) // 2 - mutual - asym
    m = len(arcs)
    rec = (2_000_000 * mutual) // m if m else 0
    return (n, m, mutual, asym, null, rec)


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_dyad_census_replay(spark):
    arcs = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (4, 0), (5, 5), (0, 1)]
    row = dyad_census(_df(spark, arcs)).collect()[0]
    assert tuple(row) == _dyad_replay(arcs)
    # self-loop (5,5) dropped, so n = 5: 2 mutual + 2 asym of C(5,2) = 10
    # dyads -> 6 null; reciprocity = 2*2/6 arcs -> 666666 ppm
    assert (row.mutual, row.asym, row.null_dyads, row.reciprocity_ppm) == (
        2, 2, 6, 666666,
    )


def test_dyad_census_functional_digraph(spark):
    arcs = [(v, (7 * v + 3) % 100) for v in range(100)]
    row = dyad_census(_df(spark, arcs)).collect()[0]
    assert tuple(row) == _dyad_replay(arcs)
    assert row.n_arcs == row.mutual * 2 + row.asym  # arc conservation


def test_fingerprint_isomorphism_invariance(spark):
    # relabeling vertices by any bijection must not change the fingerprint
    base = [(0, 1), (1, 2), (2, 0), (2, 3)]
    perm = {0: 40, 1: 7, 2: 23, 3: 11}
    fp1 = tuple(graph_fingerprint(_df(spark, base)).collect()[0])
    fp2 = tuple(
        graph_fingerprint(
            _df(spark, [(perm[a], perm[b]) for a, b in base])
        ).collect()[0]
    )
    assert fp1 == fp2


def test_fingerprint_distinguishes_topologies(spark):
    # C6 vs P6: different degree profile -> different colors -> different fp
    c6 = _df(spark, [(i, (i + 1) % 6) for i in range(6)])
    p6 = _df(spark, [(i, i + 1) for i in range(5)] + [(5, 0)][:0])
    f1 = graph_fingerprint(c6).collect()[0]
    f2 = graph_fingerprint(p6).collect()[0]
    assert (f1.n_colors, f1.color_xor) != (f2.n_colors, f2.color_xor)


def test_fingerprint_counts(spark):
    df = _df(spark, [(0, 1), (1, 2)])
    row = graph_fingerprint(df).collect()[0]
    assert (row.n_vertices, row.n_edges) == (3, 2)
    assert 1 <= row.n_colors <= 3 and row.color_sum_mod >= 0


def test_fingerprint_releases_colors(spark):
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    graph_fingerprint(_df(spark, [(0, 1), (1, 2), (2, 3)])).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1
