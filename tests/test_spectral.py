"""Spectral bisection: community recovery, balance, determinism, guards."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.graph.spectral import spectral_bisect


def _edges(spark, pairs):
    return spark.createDataFrame(sorted(pairs), "src long, dst long")


def _two_cliques(bridge=True):
    a = [(u, v) for u in range(6) for v in range(u + 1, 6)]
    b = [(u, v) for u in range(10, 16) for v in range(u + 1, 16)]
    return a + b + ([(5, 10)] if bridge else [])


def test_bisect_separates_two_cliques(spark):
    out = spectral_bisect(_edges(spark, _two_cliques()), n_iter=20).collect()
    side = {r.vertex: r.bucket for r in out}
    left = {side[v] for v in range(6)}
    right = {side[v] for v in range(10, 16)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_bisect_is_balanced_and_deterministic(spark):
    e = _edges(spark, _two_cliques())
    r1 = sorted(map(tuple, spectral_bisect(e, n_iter=12).collect()))
    r2 = sorted(map(tuple, spectral_bisect(e, n_iter=12).collect()))
    assert r1 == r2
    buckets = [t[2] for t in r1]
    assert buckets.count(0) == len(buckets) // 2


def test_bisect_bipartite_no_oscillation(spark):
    # complete bipartite K_{3,4}: the lazy walk must converge (P alone
    # oscillates with eigenvalue -1); determinism across n_iter parity
    e = _edges(spark, [(u, 10 + v) for u in range(3) for v in range(4)])
    a = {r.vertex: r.bucket for r in spectral_bisect(e, n_iter=10).collect()}
    b = {r.vertex: r.bucket for r in spectral_bisect(e, n_iter=11).collect()}
    assert set(a) == set(b) == set(range(3)) | set(range(10, 14))


def test_bisect_overflow_guard(spark):
    e = _edges(spark, _two_cliques())
    with pytest.raises(ValueError, match="lower scale"):
        spectral_bisect(e, n_iter=5, scale=10**17)
