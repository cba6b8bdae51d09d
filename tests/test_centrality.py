"""Centrality family: eigenvector (exact integer power iteration) and
closeness/harmonic (multi-source BFS).  Oracles are exact Python-int replays
— the Spark paths carry DECIMAL(38,0)/integer state, so equality is exact,
not allclose."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.graph import eigenvector_centrality
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _eigen_replay(pdf: pd.DataFrame, n_iter: int) -> dict[int, float]:
    """Exact arbitrary-precision replay: x_{t+1} = A x_t with Python ints."""
    adj: dict[int, list[int]] = {}
    for s, d in zip(pdf["src"], pdf["dst"]):
        adj.setdefault(int(s), []).append(int(d))
        adj.setdefault(int(d), []).append(int(s))
    x = {v: 1 for v in adj}
    for _ in range(n_iter):
        x = {v: sum(x[w] for w in nbrs) for v, nbrs in adj.items()}
    mx = max(x.values())
    return {v: round(xv / mx, 6) for v, xv in x.items()}


def test_eigenvector_centrality_exact_replay(spark):
    pdf = powerlaw_edges_pdf(n=60, m_per_node=3)
    got = (
        eigenvector_centrality(spark.createDataFrame(pdf), n_iter=6)
        .toPandas()
        .sort_values("vertex")
    )
    exp = _eigen_replay(pdf, 6)
    assert set(got["vertex"]) == set(exp)
    for v, s in zip(got["vertex"], got["score"]):
        assert s == pytest.approx(exp[int(v)], abs=1e-9), v


def test_eigenvector_centrality_complete_graph_uniform(spark):
    # K5: perfect symmetry -> every score is exactly 1.0
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    df = spark.createDataFrame(pd.DataFrame(edges, columns=["src", "dst"]))
    got = eigenvector_centrality(df, n_iter=6).toPandas()
    assert np.all(got["score"].to_numpy() == 1.0)


def test_eigenvector_centrality_star_odd_even(spark):
    # K1,4 is bipartite: even horizons weight both sides equally (documented
    # period-2 oscillation), odd horizons expose the hub
    star = pd.DataFrame({"src": [0, 0, 0, 0], "dst": [1, 2, 3, 4]})
    df = spark.createDataFrame(star)
    even = eigenvector_centrality(df, n_iter=6).toPandas()
    assert np.all(even["score"].to_numpy() == 1.0)
    odd = eigenvector_centrality(df, n_iter=5).toPandas().set_index("vertex")["score"]
    assert odd[0] == 1.0
    assert np.all(odd[[1, 2, 3, 4]].to_numpy() == 0.25)


def test_eigenvector_centrality_overflow_guard(spark):
    star = pd.DataFrame({"src": [0] * 12, "dst": list(range(1, 13))})
    df = spark.createDataFrame(star)
    with pytest.raises(ValueError, match="overflow"):
        eigenvector_centrality(df, n_iter=40)
