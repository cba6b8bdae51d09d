"""Onion decomposition: layer semantics + coreness cross-check vs kcore.py."""

from __future__ import annotations

import random

from split_merge_partitioner_spark.graph.kcore import coreness
from split_merge_partitioner_spark.graph.onion import onion_decomposition


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "src long, dst long")


def test_onion_path_graph_layers(spark):
    # path v0..v6 peels from both ends: layers 1,2,3,4,3,2,1, coreness all 1
    e = _edges(spark, [(i, i + 1) for i in range(6)])
    out, info = onion_decomposition(e)
    got = {r.vertex: (r.coreness, r.layer) for r in out.collect()}
    assert got == {0: (1, 1), 6: (1, 1), 1: (1, 2), 5: (1, 2),
                   2: (1, 3), 4: (1, 3), 3: (1, 4)}
    assert info["rounds"] == 4


def test_onion_clique_single_layer(spark):
    e = _edges(spark, [(u, v) for u in range(5) for v in range(u + 1, 5)])
    out, info = onion_decomposition(e)
    rows = out.collect()
    assert all(r.coreness == 4 and r.layer == 1 for r in rows) and len(rows) == 5
    assert info["rounds"] == 1


def test_onion_coreness_matches_hindex_random(spark):
    rng = random.Random(42)
    pairs = {(u, v) for u in range(40) for v in range(u + 1, 40) if rng.random() < 0.12}
    e = _edges(spark, pairs)
    out, _ = onion_decomposition(e)
    onion_core = {r.vertex: r.coreness for r in out.collect()}
    hx, _ = coreness(e)
    hindex_core = {r.vertex: r.coreness for r in hx.collect()}
    assert onion_core == hindex_core


def test_onion_shuffle_path_matches_dense(spark):
    rng = random.Random(7)
    pairs = {(u, v) for u in range(25) for v in range(u + 1, 25) if rng.random() < 0.15}
    e = _edges(spark, pairs)
    dense, di = onion_decomposition(e)
    shuf, si = onion_decomposition(e, dense_threshold=0)
    assert si["mode"] == "shuffle" and di["mode"] == "dense"
    assert si["rounds"] == di["rounds"]
    assert sorted(map(tuple, dense.collect())) == sorted(map(tuple, shuf.collect()))
