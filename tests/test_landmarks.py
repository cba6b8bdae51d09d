"""landmark_sketch / landmark_distances (graph/landmarks.py) vs exact
Python BFS: sketch exactness, upper-bound law, exactness-through-landmark,
selection determinism, horizon truncation, no-shared-landmark NULLs."""

from __future__ import annotations

from collections import deque

import pytest

from split_merge_partitioner_spark.graph import (
    landmark_distances,
    landmark_sketch,
    select_landmarks,
)


def _bfs(adj, s):
    dist = {s: 0}
    q = deque([s])
    while q:
        v = q.popleft()
        for n in adj.get(v, ()):
            if n not in dist:
                dist[n] = dist[v] + 1
                q.append(n)
    return dist


def _adj(pairs):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return adj


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_sketch_is_exact_bfs(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=100, m_per_node=3, seed=4)
    pairs = list(zip((int(x) for x in pdf["src"]), (int(x) for x in pdf["dst"])))
    adj = _adj(pairs)
    df = spark.createDataFrame(pdf)
    lms = select_landmarks(df, 3)
    # deterministic top-degree selection
    degs = sorted(((len(ns), -v) for v, ns in adj.items()), reverse=True)
    assert lms == [-x[1] for x in degs[:3]]
    sk = landmark_sketch(df, k=3, max_dist=20)
    got = {(r.vertex, r.landmark): r.dist for r in sk.collect()}
    want = {(v, l): d for l in lms for v, d in _bfs(adj, l).items()}
    assert got == want


def test_distances_upper_bound_and_exact_through_landmark(spark):
    # path 0-1-2-3-4 plus hub 9 wired to 0 and 4: landmark = hub (degree 2,
    # but force it explicitly).  d(0,4)=2 via 9 — landmark ON the shortest
    # path => estimate exact; d(1,3)=2 but via 9 costs 2+2=4 => upper bound
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (9, 0), (9, 4)]
    df = _df(spark, pairs)
    sk = landmark_sketch(df, landmarks=[9], max_dist=10)
    qp = spark.createDataFrame([(0, 4), (1, 3)], "u long, v long")
    got = {(r.u, r.v): (r.dist_ub, r.via) for r in landmark_distances(sk, qp).collect()}
    assert got[(0, 4)] == (2, 9)  # exact
    assert got[(1, 3)] == (4, 9)  # valid upper bound (true dist 2)


def test_no_shared_landmark_is_null(spark):
    # two components; landmark in the first only
    df = _df(spark, [(0, 1), (10, 11)])
    sk = landmark_sketch(df, landmarks=[0], max_dist=5)
    qp = spark.createDataFrame([(1, 11), (0, 1)], "u long, v long")
    got = {(r.u, r.v): (r.dist_ub, r.via) for r in landmark_distances(sk, qp).collect()}
    assert got[(1, 11)] == (None, None)
    assert got[(0, 1)] == (1, 0)


def test_horizon_truncation(spark):
    # chain of 6; landmark at 0 with max_dist=2 reaches only 0,1,2
    df = _df(spark, [(i, i + 1) for i in range(6)])
    sk = landmark_sketch(df, landmarks=[0], max_dist=2)
    assert {r.vertex for r in sk.collect()} == {0, 1, 2}


def test_tie_break_smallest_landmark(spark):
    # star: both landmarks 1 and 2 give d(3,4)=2; via must be 1
    df = _df(spark, [(0, i) for i in (1, 2, 3, 4)])
    sk = landmark_sketch(df, landmarks=[1, 2], max_dist=5)
    qp = spark.createDataFrame([(3, 4)], "u long, v long")
    r = landmark_distances(sk, qp).collect()[0]
    assert (r.dist_ub, r.via) == (4, 1)


def test_validations(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        select_landmarks(df, 0)
    with pytest.raises(ValueError):
        landmark_sketch(df, max_dist=0)
    with pytest.raises(ValueError):
        landmark_sketch(df, landmarks=[])


def test_no_net_storage_growth(spark):
    sc = spark.sparkContext
    df = _df(spark, [(i, i + 1) for i in range(20)])
    before = len(sc._jsc.sc().getRDDStorageInfo())
    sk = landmark_sketch(df, k=2, max_dist=25)
    sk.collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # only the sketch itself stays live
