"""Full truss decomposition: ktruss consistency, known shapes, path parity."""

from __future__ import annotations

import random

from split_merge_partitioner_spark.graph.truss import ktruss, truss_decomposition


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "src long, dst long")


def test_trussness_clique_plus_tail(spark):
    # K5 (every edge trussness 5) with a pendant path (trussness 2)
    k5 = [(u, v) for u in range(5) for v in range(u + 1, 5)]
    tail = [(4, 10), (10, 11)]
    out, info = truss_decomposition(_edges(spark, k5 + tail))
    got = {(r.src, r.dst): r.trussness for r in out.collect()}
    assert all(got[e] == 5 for e in k5)
    assert got[(4, 10)] == 2 and got[(10, 11)] == 2
    assert info["mode"] == "dense"


def test_trussness_consistent_with_ktruss(spark):
    rng = random.Random(3)
    pairs = {(u, v) for u in range(30) for v in range(u + 1, 30) if rng.random() < 0.25}
    e = _edges(spark, pairs)
    out, _ = truss_decomposition(e)
    tn = {(r.src, r.dst): r.trussness for r in out.collect()}
    assert set(tn) == set(pairs)
    for k in (3, 4, 5):
        kt = {(r.src, r.dst) for r in ktruss(e, k=k).select("src", "dst").collect()}
        assert kt == {p for p, t in tn.items() if t >= k}, f"k={k}"


def test_trussness_shuffle_path_matches_dense(spark):
    rng = random.Random(9)
    pairs = {(u, v) for u in range(18) for v in range(u + 1, 18) if rng.random() < 0.3}
    e = _edges(spark, pairs)
    dense, di = truss_decomposition(e)
    shuf, si = truss_decomposition(e, dense_threshold=0)
    assert di["mode"] == "dense" and si["mode"] == "shuffle"
    assert di["rounds"] == si["rounds"]
    assert sorted(map(tuple, dense.collect())) == sorted(map(tuple, shuf.collect()))
