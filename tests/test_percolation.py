"""Triangle (k=3 clique) percolation communities vs a pure-Python replay."""

from __future__ import annotations

import itertools

import pytest

from split_merge_partitioner_spark.graph import (
    percolation_summary,
    triangle_percolation,
)


def _df(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _py_percolation(pairs):
    """Reference CPM k=3: union-find over triangle edges sharing a triangle;
    community label = min encoded edge-node, exactly the engine contract."""
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    enc = lambda u, v: min(u, v) * (1 << 32) + max(u, v)  # noqa: E731
    parent: dict[int, int] = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(x, y):
        for n in (x, y):
            parent.setdefault(n, n)
        rx, ry = find(x), find(y)
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)

    verts = sorted(adj)
    for a, b, c in itertools.combinations(verts, 3):
        if b in adj[a] and c in adj[a] and c in adj[b]:
            union(enc(a, b), enc(b, c))
            union(enc(a, b), enc(a, c))
    out = set()
    for node in parent:
        root = find(node)
        out.add((node // (1 << 32), root))
        out.add((node % (1 << 32), root))
    return out


def _spark_memberships(spark, pairs, **kw):
    mem, info = triangle_percolation(_df(spark, pairs), **kw)
    rows = {(r.vertex, r.community) for r in mem.collect()}
    return rows, info


def test_bowtie_overlap_and_separation(spark):
    # two triangles sharing only VERTEX 0: distinct communities (the CPM
    # property Louvain can't express), vertex 0 a member of both
    pairs = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)]
    rows, _ = _spark_memberships(spark, pairs)
    assert rows == _py_percolation(pairs)
    comms = {c for _, c in rows}
    assert len(comms) == 2
    assert {c for v, c in rows if v == 0} == comms  # overlap at the waist


def test_edge_sharing_chain_merges(spark):
    # triangles (0,1,2) and (1,2,3) share edge (1,2) -> ONE community
    pairs = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    rows, _ = _spark_memberships(spark, pairs)
    assert rows == _py_percolation(pairs)
    assert len({c for _, c in rows}) == 1
    assert {v for v, _ in rows} == {0, 1, 2, 3}


def test_triangle_free_graph_empty(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]  # C4: no triangles
    rows, info = _spark_memberships(spark, pairs)
    assert rows == set()
    assert info["n_links"] == 0


@pytest.mark.parametrize("seed", [7, 19])
def test_random_graph_matches_python(spark, seed):
    import random

    rng = random.Random(seed)
    n = 40
    pairs = {
        (a, b)
        for _ in range(220)
        for a, b in [sorted(rng.sample(range(n), 2))]
    }
    rows, _ = _spark_memberships(spark, sorted(pairs))
    assert rows == _py_percolation(sorted(pairs))


def test_orientation_invariance_and_summary(spark):
    pairs = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4), (5, 6)]
    r_deg, _ = _spark_memberships(spark, pairs, orient="degree")
    r_id, _ = _spark_memberships(spark, pairs, orient="id")
    assert r_deg == r_id
    mem, _ = triangle_percolation(_df(spark, pairs))
    summ = {r.community: (r.n_vertices, r.n_multi) for r in percolation_summary(mem).collect()}
    # each community has 3 vertices; exactly one member (vertex 0) is multi
    assert sorted(summ.values()) == [(3, 1), (3, 1)]


def test_id_bound_validation(spark):
    with pytest.raises(ValueError):
        triangle_percolation(_df(spark, [(0, 1 << 31)]))


def test_no_net_storage_growth(spark):
    sc = spark.sparkContext
    pairs = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    before = len(sc._jsc.sc().getRDDStorageInfo())
    mem, _ = triangle_percolation(_df(spark, pairs))
    mem.collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    # live result checkpoint + stars CC's universe/fixpoint relations
    assert after - before <= 3
