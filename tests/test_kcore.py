"""Coreness (graph/kcore.py): exact vs peeling oracle, path agreement,
fixed-iteration mode, structural sanity."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from split_merge_partitioner_spark.graph.kcore import coreness


def _exact_coreness(pairs):
    """Textbook sequential peel — the oracle."""
    verts = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj = [[] for _ in range(n)]
    for a, b in pairs:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
    cur = np.array([len(a) for a in adj])
    alive = np.ones(n, bool)
    heap = [(int(cur[i]), i) for i in range(n)]
    heapq.heapify(heap)
    k = 0
    res = np.zeros(n, int)
    while heap:
        dv, v = heapq.heappop(heap)
        if not alive[v] or dv != cur[v]:
            continue
        k = max(k, dv)
        res[v] = k
        alive[v] = False
        for u in adj[v]:
            if alive[u]:
                cur[u] -= 1
                heapq.heappush(heap, (int(cur[u]), u))
    return {v: int(res[idx[v]]) for v in verts}


def _df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame({"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]})
    )


def _random_pairs(seed, n_v=80, n_draw=400):
    rng = np.random.default_rng(seed)
    raw = {(int(a), int(b)) for a, b in rng.integers(0, n_v, size=(n_draw, 2)) if a != b}
    return list({(min(a, b), max(a, b)) for a, b in raw})


def test_coreness_matches_peeling_oracle(spark):
    pairs = _random_pairs(3)
    e = _df(spark, pairs).persist()
    out, info = coreness(e)
    got = dict(out.toPandas().itertuples(index=False))
    assert info["converged"] and info["mode"] == "dense"
    assert got == _exact_coreness(pairs)


def test_paths_agree_exact(spark):
    pairs = _random_pairs(11)
    e = _df(spark, pairs).persist()
    pd_d = coreness(e)[0].toPandas().sort_values("vertex").reset_index(drop=True)
    pd_s = (
        coreness(e, dense_threshold=0)[0]  # force the shuffle/window path
        .toPandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pd_d, pd_s, check_dtype=False)


def test_clique_and_tree_structure(spark):
    k = 7
    clique = [(i, j) for i in range(k) for j in range(i + 1, k)]
    tree = [(100, 101), (100, 102), (101, 103), (101, 104), (102, 105)]
    e = _df(spark, clique + tree).persist()
    got = dict(coreness(e)[0].toPandas().itertuples(index=False))
    assert all(got[i] == k - 1 for i in range(k))  # clique: coreness k-1
    assert all(got[v] == 1 for v in range(100, 106))  # tree: coreness 1


def test_fixed_iteration_mode(spark):
    pairs = _random_pairs(5)
    e = _df(spark, pairs).persist()
    exact = _exact_coreness(pairs)
    # enough sweeps -> equals exact coreness (fixpoint is stable), both paths
    for kwargs in ({}, {"dense_threshold": 0}):
        out, info = coreness(e, n_iter=12, **kwargs)
        assert info["iterations"] == 12
        got = dict(out.toPandas().itertuples(index=False))
        assert got == exact


def test_empty(spark):
    e = spark.createDataFrame([], schema="src long, dst long")
    out, info = coreness(e)
    assert out.count() == 0 and info["converged"]
