"""Cuthill-McKee ordering + gap-bit accounting tests: dense/shuffle parity,
hand-replayed CM on small graphs, permutation invariants, bandwidth/gap
reduction on a scrambled lattice, and the compression report shape."""

from __future__ import annotations

import random

from split_merge_partitioner_spark.graph.ordering import (
    adjacency_gap_bits,
    cuthill_mckee_order,
    order_compression_report,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long")


def _pos(df):
    return {r.vertex: r.pos for r in df.collect()}


def test_cm_hand_star(spark):
    # star 1-(2,3,4): start = (deg,id)-min = 2; CM = [2,1,3,4]
    star = [(1, 2), (1, 3), (1, 4)]
    cm, info = cuthill_mckee_order(_df(spark, star), reverse=False)
    assert info["mode"] == "dense"
    assert _pos(cm) == {2: 0, 1: 1, 3: 2, 4: 3}
    rcm, _ = cuthill_mckee_order(_df(spark, star), reverse=True)
    assert _pos(rcm) == {2: 3, 1: 2, 3: 1, 4: 0}


def test_cm_dense_shuffle_parity(spark):
    rng = random.Random(5)
    rows = sorted(
        {
            (min(a, b), max(a, b))
            for a, b in ((rng.randrange(30), rng.randrange(30)) for _ in range(45))
            if a != b
        }
    )
    d, di = cuthill_mckee_order(_df(spark, rows))
    s, si = cuthill_mckee_order(_df(spark, rows), dense_threshold=0)
    assert di["mode"] == "dense" and si["mode"] == "shuffle"
    assert _pos(d) == _pos(s)
    d2, _ = cuthill_mckee_order(_df(spark, rows), reverse=False)
    s2, _ = cuthill_mckee_order(_df(spark, rows), reverse=False, dense_threshold=0)
    assert _pos(d2) == _pos(s2)


def test_cm_is_permutation_and_components_consecutive(spark):
    rows = [(0, 1), (1, 2), (10, 11), (11, 12), (10, 12), (20, 21)]
    cm, info = cuthill_mckee_order(_df(spark, rows))
    pos = _pos(cm)
    assert sorted(pos.values()) == list(range(len(pos)))
    # component blocks consecutive, in min-vertex order
    blocks = [{0, 1, 2}, {10, 11, 12}, {20, 21}]
    lo = 0
    for blk in blocks:
        got = {pos[v] for v in blk}
        assert got == set(range(lo, lo + len(blk))), (blk, got)
        lo += len(blk)


def test_rcm_reduces_bandwidth_on_scrambled_lattice(spark):
    # path graph with scrambled ids: natural order is terrible, RCM
    # recovers the path layout (bandwidth 1)
    rng = random.Random(7)
    ids = list(range(100))
    rng.shuffle(ids)
    rows = [(min(ids[i], ids[i + 1]), max(ids[i], ids[i + 1])) for i in range(99)]
    rcm, _ = cuthill_mckee_order(_df(spark, rows))
    pos = _pos(rcm)
    bw = max(abs(pos[a] - pos[b]) for a, b in rows)
    assert bw == 1
    nat = {v: v for v in pos}
    bw_nat = max(abs(nat[a] - nat[b]) for a, b in rows)
    assert bw_nat > 10


def test_gap_bits_exact_and_order_sensitive(spark):
    # path 0-1-2 under identity order: v0 nbr [1]: bits(1)=1; v1 nbrs
    # [0,2]: bits(1)+bits(2-0)=1+2; v2 nbr [1]: bits(1)=1 -> total 5
    rows = [(0, 1), (1, 2)]
    order = spark.createDataFrame([(0, 0), (1, 1), (2, 2)], "vertex long, pos long")
    r = adjacency_gap_bits(_df(spark, rows), order).collect()[0]
    assert (r.total_bits, r.n_dirs) == (5, 4)
    # swap 0<->2: same by symmetry; put 1 at the end: gaps widen
    worse = spark.createDataFrame([(0, 0), (2, 1), (1, 2)], "vertex long, pos long")
    r2 = adjacency_gap_bits(_df(spark, rows), worse).collect()[0]
    assert r2.total_bits > r.total_bits


def test_order_compression_report(spark):
    rng = random.Random(7)
    ids = list(range(80))
    rng.shuffle(ids)
    rows = [(min(ids[i], ids[i + 1]), max(ids[i], ids[i + 1])) for i in range(79)]
    rep = {r.order_name: (r.total_bits, r.n_dirs) for r in
           order_compression_report(_df(spark, rows)).collect()}
    assert set(rep) == {"natural", "degree_desc", "rcm"}
    assert all(nd == 2 * 79 for _, nd in rep.values())
    # the scrambled path compresses best under RCM
    assert rep["rcm"][0] < rep["natural"][0]
