"""directed_pagerank vs a NumPy dense replay with dangling redistribution;
mass conservation; direction semantics."""

from __future__ import annotations

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import directed_pagerank


def _np_dpr(edge_list, n_iter, d=0.85):
    verts = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in set(edge_list):
        A[idx[a], idx[b]] = 1.0
    od = A.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        dang = r[od == 0].sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            share = np.where(od > 0, r / np.maximum(od, 1), 0.0)
        r = (1 - d) / n + d * (A.T @ share + dang / n)
    return dict(zip(verts, r))


def test_directed_pagerank_matches_numpy_with_dangling(spark):
    # functional-ish graph with guaranteed dangling sinks (100, 101)
    edge_list = [(v, (7 * v + 3) % 40) for v in range(40)] + [
        (0, 100), (1, 101), (2, 100)
    ]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["vertex"]: r["rank"] for r in directed_pagerank(df, n_iter=8).collect()}
    exp = _np_dpr(edge_list, 8)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)  # no mass leak


def test_directed_pagerank_direction_semantics(spark):
    """A 'hub pointed at by everyone' outranks everyone; reversing the
    edges dethrones it."""
    star_in = [(i, 0) for i in range(1, 8)]
    fwd = {r["vertex"]: r["rank"]
           for r in directed_pagerank(
               spark.createDataFrame(star_in, "src long, dst long"), n_iter=6
           ).collect()}
    assert fwd[0] == max(fwd.values())
    rev = {r["vertex"]: r["rank"]
           for r in directed_pagerank(
               spark.createDataFrame([(b, a) for a, b in star_in], "src long, dst long"),
               n_iter=6,
           ).collect()}
    assert rev[0] < max(rev.values())


def test_directed_pagerank_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        directed_pagerank(df, n_iter=0)
    with pytest.raises(ValueError):
        directed_pagerank(df, damping=0.0)
