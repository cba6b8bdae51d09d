"""weighted_pagerank vs a NumPy dense replay; weight semantics and the
uniform-weight == unweighted identity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph import weighted_pagerank
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _np_wpr(edge_list, weights, n_iter, d=0.85):
    verts = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    W = np.zeros((n, n))
    for (a, b), w in zip(edge_list, weights):
        W[idx[a], idx[b]] += w
        W[idx[b], idx[a]] += w
    S = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - d) / n + d * (W.T @ (r / S))
    return dict(zip(verts, r))


def test_weighted_pagerank_matches_numpy(spark):
    pdf = powerlaw_edges_pdf(n=120, m_per_node=3)
    edge_list = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    weights = [(a + b) % 7 + 1 for a, b in edge_list]
    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in zip(edge_list, weights)],
        "src long, dst long, w long",
    )
    got = {r["vertex"]: r["rank"] for r in weighted_pagerank(df, n_iter=8).collect()}
    exp = _np_wpr(edge_list, weights, 8)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_weighted_pagerank_weight_semantics(spark):
    """On a 3-path with one heavy edge, the heavy edge's far endpoint
    outranks the light edge's: weights steer rank mass."""
    df = spark.createDataFrame(
        [(0, 1, 9), (1, 2, 1)], "src long, dst long, w long"
    )
    got = {r["vertex"]: r["rank"] for r in weighted_pagerank(df, n_iter=12).collect()}
    assert got[0] > got[2]  # 0 receives 9/10 of 1's outflow, 2 gets 1/10


def test_weighted_pagerank_uniform_equals_unweighted(spark):
    """All-equal weights reduce to plain PageRank (degree-proportional
    splitting) — cross-checked against the NumPy replay with w=1."""
    pdf = powerlaw_edges_pdf(n=80, m_per_node=3)
    edge_list = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    df = spark.createDataFrame(
        [(a, b, 5) for a, b in edge_list], "src long, dst long, w long"
    )
    got = {r["vertex"]: r["rank"] for r in weighted_pagerank(df, n_iter=6).collect()}
    exp = _np_wpr(edge_list, [1] * len(edge_list), 6)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)


def test_weighted_pagerank_validation(spark):
    df = spark.createDataFrame([(0, 1, 1)], "src long, dst long, w long")
    with pytest.raises(ValueError):
        weighted_pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        weighted_pagerank(df, damping=1.0)


def test_weighted_pagerank_rejects_nonpositive_weights(spark):
    df = spark.createDataFrame([(0, 1, 0), (1, 2, 3)], "src long, dst long, w long")
    with pytest.raises(ValueError, match="non-positive"):
        weighted_pagerank(df)
