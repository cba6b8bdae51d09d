"""betweenness: Brandes dependency accumulation (graph/betweenness.py).

The NumPy oracle below is a straight textbook Brandes (stack/queue form) —
independent of the level-relation implementation under test."""

from __future__ import annotations

from collections import deque

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.graph import betweenness


def _brandes_oracle(pdf: pd.DataFrame, seeds: list[int]) -> dict[int, float]:
    adj: dict[int, list[int]] = {}
    for u, v in zip(pdf.src.tolist(), pdf.dst.tolist()):
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    bc = {v: 0.0 for v in adj}
    for s in seeds:
        if s not in adj:
            continue
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        preds: dict[int, list[int]] = {s: []}
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    sigma[w] = 0.0
                    preds[w] = []
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
                    preds[w].append(v)
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            for v in preds[w]:
                delta[v] += sigma[v] / sigma[w] * (1 + delta[w])
            if w != s:
                bc[w] += delta[w]
    return {v: x / 2.0 for v, x in bc.items()}


@pytest.fixture(scope="module")
def graph_pdf():
    rng = np.random.default_rng(23)
    src = rng.integers(0, 70, 400)
    dst = rng.integers(0, 70, 400)
    pdf = pd.DataFrame({"src": np.minimum(src, dst), "dst": np.maximum(src, dst)})
    return pdf[pdf.src != pdf.dst].drop_duplicates().reset_index(drop=True)


def test_betweenness_matches_brandes_all_seeds(spark, graph_pdf):
    """Exact betweenness (seeds = every vertex) vs textbook Brandes."""
    verts = sorted(set(graph_pdf.src) | set(graph_pdf.dst))
    got = (
        betweenness(spark.createDataFrame(graph_pdf), verts)
        .toPandas()
        .set_index("vertex")
        .bc.to_dict()
    )
    want = _brandes_oracle(graph_pdf, verts)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-5, (v, got[v], want[v])


def test_betweenness_sampled_seed_subset(spark, graph_pdf):
    """Subset estimator: identical to Brandes restricted to the same seeds."""
    seeds = [0, 5, 11]
    got = (
        betweenness(spark.createDataFrame(graph_pdf), seeds)
        .toPandas()
        .set_index("vertex")
        .bc.to_dict()
    )
    want = _brandes_oracle(graph_pdf, seeds)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-6


def test_betweenness_path_graph_by_hand(spark):
    """Path 0-1-2-3-4, all seeds: interior vertex bc = (left)(right) pairs;
    endpoints 0.  bc(2) = 4 pairs /  ... exact textbook values."""
    pdf = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 4]})
    got = (
        betweenness(spark.createDataFrame(pdf), [0, 1, 2, 3, 4])
        .toPandas()
        .set_index("vertex")
        .bc.to_dict()
    )
    assert got == {0: 0.0, 1: 3.0, 2: 4.0, 3: 3.0, 4: 0.0}
    with pytest.raises(ValueError):
        betweenness(spark.createDataFrame(pdf), [])


def test_betweenness_disconnected_reports_zero(spark):
    """A component no seed touches reports bc = 0 rows, not missing rows."""
    pdf = pd.DataFrame({"src": [0, 1, 10, 11], "dst": [1, 2, 11, 12]})
    got = (
        betweenness(spark.createDataFrame(pdf), [0])
        .toPandas()
        .set_index("vertex")
        .bc.to_dict()
    )
    assert got[11] == 0.0 and got[1] > 0
    assert set(got) == {0, 1, 2, 10, 11, 12}
