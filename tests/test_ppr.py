"""personalized_pagerank: seeded random-walk-with-restart (graph/ppr.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.graph import personalized_pagerank


def _numpy_ppr(pdf: pd.DataFrame, seeds: list[int], d: float, n_iter: int):
    verts = sorted(set(pdf.src) | set(pdf.dst))
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for u, v in zip(pdf.src, pdf.dst):
        A[idx[u], idx[v]] += 1
        A[idx[v], idx[u]] += 1
    deg = A.sum(axis=1)
    s = np.zeros(n)
    live = [x for x in set(seeds) if x in idx]
    for x in set(seeds):
        if x in idx:
            s[idx[x]] = 1.0 / len(set(seeds))
    r = s.copy()
    for _ in range(n_iter):
        r = (1 - d) * s + d * (A.T @ (r / deg))
    return pd.DataFrame({"vertex": verts, "ppr": r}), len(live)


@pytest.fixture(scope="module")
def graph_pdf():
    rng = np.random.default_rng(13)
    src = rng.integers(0, 80, 500)
    dst = rng.integers(0, 80, 500)
    pdf = pd.DataFrame({"src": np.minimum(src, dst), "dst": np.maximum(src, dst)})
    return pdf[pdf.src != pdf.dst].drop_duplicates().reset_index(drop=True)


def test_ppr_matches_numpy_reference(spark, graph_pdf):
    seeds = [0, 3, 7]
    got = (
        personalized_pagerank(spark.createDataFrame(graph_pdf), seeds, n_iter=10)
        .toPandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    want, _ = _numpy_ppr(graph_pdf, seeds, 0.85, 10)
    assert np.allclose(got.ppr.to_numpy(), want.ppr.to_numpy(), atol=1e-9)
    # probability mass conserved (no dangling vertices on the canonical graph)
    assert abs(got.ppr.sum() - 1.0) < 1e-6


def test_ppr_localizes_around_seeds(spark):
    """On a long path graph seeded at one end, mass decays with distance —
    the defining property vs global pagerank."""
    pdf = pd.DataFrame({"src": range(0, 30), "dst": range(1, 31)})
    got = (
        personalized_pagerank(spark.createDataFrame(pdf), [0], n_iter=15)
        .toPandas()
        .set_index("vertex")
        .ppr
    )
    assert got[0] > got[5] > got[15] > got[29]


def test_ppr_missing_seed_surfaces_as_lost_mass(spark, graph_pdf):
    """A seed absent from the graph keeps its teleport share, so total mass
    drops below 1 (documented garbage-in surface, not silent renorm)."""
    got = personalized_pagerank(
        spark.createDataFrame(graph_pdf), [0, 10**9], n_iter=5
    ).toPandas()
    assert got.ppr.sum() < 0.75
    with pytest.raises(ValueError):
        personalized_pagerank(spark.createDataFrame(graph_pdf), [])
