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


# ---------------------------------------------------------------------------
# WL quotient supergraph
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import wl_quotient


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_wl_quotient_cycle_collapses_to_one_supernode(spark):
    c6 = [(i, (i + 1) % 6) for i in range(6)]
    out = wl_quotient(spark.createDataFrame(c6, "src long, dst long"))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.c_src == r.c_dst
    assert r.n_edges == 6 and r.n_src == 6 and r.n_dst == 6


def test_wl_quotient_star_two_roles(spark):
    star = [(0, v) for v in range(1, 6)]
    out = wl_quotient(spark.createDataFrame(star, "src long, dst long"))
    rows = out.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.c_src != r.c_dst
    assert r.n_edges == 5
    assert sorted([r.n_src, r.n_dst]) == [1, 5]


def test_wl_quotient_path_roles_and_conservation(spark):
    # P4: end vertices {1,4} vs middle {2,3} -> end-mid (2 edges) + mid-mid (1)
    p4 = [(1, 2), (2, 3), (3, 4)]
    out = wl_quotient(spark.createDataFrame(p4, "src long, dst long"))
    rows = out.collect()
    assert sum(r.n_edges for r in rows) == 3
    by_edges = {r.n_edges: r for r in rows}
    assert set(by_edges) == {1, 2}
    assert sorted([by_edges[2].n_src, by_edges[2].n_dst]) == [2, 2]
    assert by_edges[1].c_src == by_edges[1].c_dst
    assert by_edges[1].n_src == 2


def test_wl_quotient_matches_wl_colors_grouping_and_relabel_invariant(spark):
    import numpy as np
    from split_merge_partitioner_spark.graph import wl_colors

    rng = np.random.default_rng(6)
    pairs = sorted({
        (int(min(a, b)), int(max(a, b)))
        for a, b in rng.integers(0, 40, size=(70, 2)) if a != b
    })
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = wl_quotient(df)
    cols = {r.vertex: r.color for r in wl_colors(df).collect()}
    exp = {}
    for a, b in pairs:
        key = tuple(sorted((cols[a], cols[b])))
        exp[key] = exp.get(key, 0) + 1
    got = {(r.c_src, r.c_dst): r.n_edges for r in out.collect()}
    assert got == exp
    # relabel invariance of the anonymous multiset
    ren = {v: 1000 + 7 * v for v in {x for e in pairs for x in e}}
    df2 = spark.createDataFrame(
        [(ren[a], ren[b]) for a, b in pairs], "src long, dst long"
    )
    sig = lambda d: sorted(
        (r.n_edges, tuple(sorted((r.n_src, r.n_dst)))) for r in d.collect()
    )
    assert sig(wl_quotient(df2)) == sig(out)
