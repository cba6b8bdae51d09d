"""Biconnectivity tests: dense (iterative Tarjan) vs shuffle (Tarjan-Vishkin)
parity, articulation points against a brute-force remove-one-vertex
reachability check over random graphs, hand-built topologies, and
cross-module consistency with bridges (single-edge BCCs == bridges)."""

from __future__ import annotations

import random

import pytest

from split_merge_partitioner_spark.graph.biconnectivity import (
    articulation_points,
    biconnected_components,
)
from split_merge_partitioner_spark.graph.bridges import bridges


def _rand_graph(seed, n=40, m=60):
    rng = random.Random(seed)
    seen, rows = set(), []
    while len(rows) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a == b:
            continue
        a, b = min(a, b), max(a, b)
        if (a, b) in seen:
            continue
        seen.add((a, b))
        rows.append((a, b))
    return rows


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _labels(df):
    return {(r.src, r.dst): r.bcc for r in df.collect()}


def _brute_articulation(rows):
    """v is an articulation point iff removing v splits the component count
    among the REMAINING vertices of v's component — checked by union-find."""
    verts = sorted({v for e in rows for v in e})

    def n_comp(edge_rows, vs):
        par = {v: v for v in vs}

        def find(x):
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        for a, b in edge_rows:
            if a in par and b in par:
                par[find(a)] = find(b)
        return len({find(v) for v in vs})

    base = n_comp(rows, verts)
    arts = set()
    for v in verts:
        vs = [u for u in verts if u != v]
        sub = [e for e in rows if v not in e]
        if n_comp(sub, vs) > base:  # removing v split something
            arts.add(v)
    return arts


@pytest.mark.parametrize("seed", [1, 2, 5, 9])
def test_articulation_matches_bruteforce_dense(spark, seed):
    rows = _rand_graph(seed, n=30, m=40)
    ap, info = articulation_points(_df(spark, rows))
    assert info["mode"] == "dense"
    got = {r.vertex for r in ap.collect() if r.is_articulation}
    assert got == _brute_articulation(rows)


def test_dense_shuffle_parity_and_bruteforce(spark):
    rows = _rand_graph(7, n=22, m=30)
    d, di = biconnected_components(_df(spark, rows))
    s, si = biconnected_components(_df(spark, rows), dense_threshold=0)
    assert di["mode"] == "dense" and si["mode"] == "shuffle"
    assert _labels(d) == _labels(s)
    assert di["n_bcc"] == si["n_bcc"]
    ap, _ = articulation_points(_df(spark, rows), dense_threshold=0)
    got = {r.vertex for r in ap.collect() if r.is_articulation}
    assert got == _brute_articulation(rows)


def test_topologies(spark):
    # path: every internal vertex articulates, each edge its own BCC
    path = [(0, 1), (1, 2), (2, 3)]
    lab, info = biconnected_components(_df(spark, path))
    assert info["n_bcc"] == 3 and len(set(_labels(lab).values())) == 3
    ap, _ = articulation_points(_df(spark, path))
    assert {r.vertex for r in ap.collect() if r.is_articulation} == {1, 2}
    # cycle: one BCC, no articulation
    cyc = [(0, 1), (1, 2), (2, 3), (0, 3)]
    lab, info = biconnected_components(_df(spark, cyc))
    assert info["n_bcc"] == 1
    # two triangles sharing a vertex
    two = [(1, 2), (1, 3), (2, 3), (1, 4), (1, 5), (4, 5)]
    ap, _ = articulation_points(_df(spark, two))
    rows = {r.vertex: (r.n_bcc, r.is_articulation) for r in ap.collect()}
    assert rows[1] == (2, True)
    assert all(not a for v, (_, a) in rows.items() if v != 1)
    # star: hub in every BCC
    star = [(1, 2), (1, 3), (1, 4)]
    ap, _ = articulation_points(_df(spark, star))
    rows = {r.vertex: r.n_bcc for r in ap.collect()}
    assert rows[1] == 3 and rows[2] == rows[3] == rows[4] == 1


def test_parity_on_tree_chords_shape(spark):
    # the driver fixture's shape: v -> v div 3 tree + sparse chords
    rows = sorted(
        {(min(v, v // 3), max(v, v // 3)) for v in range(1, 200)}
        | {(v - 10, v) for v in range(10, 200) if v % 9 == 0}
    )
    rows = [(a, b) for a, b in rows if a != b]
    d, _ = biconnected_components(_df(spark, rows))
    s, _ = biconnected_components(_df(spark, rows), dense_threshold=0)
    assert _labels(d) == _labels(s)
    ap, _ = articulation_points(_df(spark, rows), dense_threshold=0)
    got = {r.vertex for r in ap.collect() if r.is_articulation}
    assert got == _brute_articulation(rows)


def test_single_edge_bccs_are_exactly_bridges(spark):
    rows = _rand_graph(11, n=30, m=38)
    lab, _ = biconnected_components(_df(spark, rows))
    sizes: dict[int, int] = {}
    for b in _labels(lab).values():
        sizes[b] = sizes.get(b, 0) + 1
    single = {e for e, b in _labels(lab).items() if sizes[b] == 1}
    br, _ = bridges(_df(spark, rows))
    assert single == {(r.src, r.dst) for r in br.collect() if r.is_bridge}


def test_empty_and_single_edge(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    lab, info = biconnected_components(empty)
    assert lab.count() == 0 and info["n_bcc"] == 0
    one, info = biconnected_components(_df(spark, [(3, 8)]))
    assert _labels(one) == {(3, 8): 3 * (1 << 31) + 8}
    ap, _ = articulation_points(_df(spark, [(3, 8)]))
    assert not any(r.is_articulation for r in ap.collect())


def test_id_bound_fail_fast(spark):
    big = _df(spark, [(1, 1 << 31)])
    with pytest.raises(Exception, match="2\\^31"):
        biconnected_components(big)
    with pytest.raises(Exception, match="2\\^31"):
        biconnected_components(big, dense_threshold=0)


def test_shuffle_path_releases_storage(spark):
    rows = _rand_graph(3, n=20, m=26)
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    out, _ = biconnected_components(_df(spark, rows), dense_threshold=0)
    out.count()
    from split_merge_partitioner_spark.storage import release

    release(out)
    assert len(sc._jsc.sc().getRDDStorageInfo()) <= before + 1


def test_block_cut_tree(spark):
    from split_merge_partitioner_spark.graph.biconnectivity import block_cut_tree

    # path 0-1-2-3: blocks {01},{12},{23}; cuts {1,2}; 4 incidences
    path = [(0, 1), (1, 2), (2, 3)]
    bct, _ = block_cut_tree(_df(spark, path))
    rows = {(r.vertex, r.bcc) for r in bct.collect()}
    k = 1 << 31
    assert rows == {(1, 0 * k + 1), (1, 1 * k + 2), (2, 1 * k + 2), (2, 2 * k + 3)}
    # two triangles sharing vertex 1: one cut vertex in two blocks
    two = [(1, 2), (1, 3), (2, 3), (1, 4), (1, 5), (4, 5)]
    bct, _ = block_cut_tree(_df(spark, two))
    rows = sorted((r.vertex, r.bcc) for r in bct.collect())
    assert [v for v, _ in rows] == [1, 1] and len({b for _, b in rows}) == 2
    # connected random graph: the block-cut structure is a TREE:
    # incidences = blocks + cut vertices - 1
    rows_g = _rand_graph(4, n=25, m=28)
    rows_g.extend((0, v) for v in range(1, 25)
                  if (0, v) not in rows_g)  # force connectivity via hub 0
    rows_g = sorted(set(rows_g))
    lab, info = biconnected_components(_df(spark, rows_g))
    ap, _ = articulation_points(_df(spark, rows_g), labels=lab)
    n_art = sum(1 for r in ap.collect() if r.is_articulation)
    bct, _ = block_cut_tree(_df(spark, rows_g))
    assert bct.count() == info["n_bcc"] + n_art - 1
