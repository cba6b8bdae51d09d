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


# ---------------------------------------------------------------------------
# warm-start incremental PageRank
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import warm_pagerank


def _np_warm(base_edges, delta_edges, prior, n_iter, d=0.85):
    merged = sorted(set(base_edges) | set(delta_edges))
    verts = sorted({v for e in merged for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    A = np.zeros((n, n))
    for a, b in merged:
        A[idx[a], idx[b]] = 1.0
    od = A.sum(axis=1)
    r = np.array([prior.get(v, 1.0 / n) for v in verts])
    r = r / r.sum()
    for _ in range(n_iter):
        dang = r[od == 0].sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            share = np.where(od > 0, r / np.maximum(od, 1), 0.0)
        r = (1 - d) / n + d * (A.T @ share + dang / n)
    return dict(zip(verts, r))


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_warm_pagerank_matches_numpy_replay(spark):
    base = [(v, (7 * v + 3) % 40) for v in range(40)] + [(0, 100), (2, 100)]
    delta = [(v, (13 * v + 7) % 40) for v in range(0, 40, 5)] + [(1, 200)]
    prior_df = directed_pagerank(_edges_df(spark, base), n_iter=6)
    prior = {r["vertex"]: r["rank"] for r in prior_df.collect()}
    got = {
        r["vertex"]: r["rank"]
        for r in warm_pagerank(
            _edges_df(spark, base), _edges_df(spark, delta), prior_df, n_iter=3
        ).collect()
    }
    exp = _np_warm(base, delta, prior, 3)
    assert got.keys() == exp.keys()
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-12)
    assert 200 in got and got[200] > 0  # vertex new in the delta participates
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_warm_start_beats_cold_restart(spark):
    """After a small delta, n warm supersteps land closer to the merged
    fixpoint than n cold supersteps — the reason to checkpoint ranks."""
    base = [(v, (7 * v + 3) % 60) for v in range(60)] + [
        (v, (31 * v + 17) % 60) for v in range(0, 60, 5)
    ]
    delta = [(3, 11), (29, 44), (50, 2)]
    base_df, delta_df = _edges_df(spark, base), _edges_df(spark, delta)
    merged_df = _edges_df(spark, sorted(set(base) | set(delta)))
    truth = {
        r["vertex"]: r["rank"]
        for r in directed_pagerank(merged_df, n_iter=40).collect()
    }
    prior_df = directed_pagerank(base_df, n_iter=24)  # the "checkpointed" ranks
    warm = {
        r["vertex"]: r["rank"]
        for r in warm_pagerank(base_df, delta_df, prior_df, n_iter=4).collect()
    }
    cold = {
        r["vertex"]: r["rank"]
        for r in directed_pagerank(merged_df, n_iter=4).collect()
    }
    err_warm = sum(abs(warm[v] - truth[v]) for v in truth)
    err_cold = sum(abs(cold[v] - truth[v]) for v in truth)
    assert err_warm < err_cold / 3  # warm start is decisively closer


def test_warm_pagerank_empty_delta_continues_the_chain(spark):
    """warm(base, {}, PR_k, j) == PR_{k+j}: renormalizing an already-unit
    vector is an ulp-level no-op, so the chain just continues."""
    base = [(v, (7 * v + 3) % 30) for v in range(30)] + [(0, 99)]
    base_df = _edges_df(spark, base)
    prior_df = directed_pagerank(base_df, n_iter=3)
    empty = spark.createDataFrame([], "src long, dst long")
    got = {
        r["vertex"]: r["rank"]
        for r in warm_pagerank(base_df, empty, prior_df, n_iter=2).collect()
    }
    exp = {
        r["vertex"]: r["rank"]
        for r in directed_pagerank(base_df, n_iter=5).collect()
    }
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-13)


def test_warm_pagerank_validations(spark):
    df = _edges_df(spark, [(0, 1)])
    prior = directed_pagerank(df, n_iter=1)
    with pytest.raises(ValueError):
        warm_pagerank(df, df, prior, n_iter=0)
    with pytest.raises(ValueError):
        warm_pagerank(df, df, prior, damping=1.0)
    zero_prior = df.sparkSession.createDataFrame(
        [(0, 0.0), (1, 0.0)], "vertex long, rank double"
    )
    with pytest.raises(ValueError):
        warm_pagerank(df, df, zero_prior)


def test_warm_pagerank_no_net_storage_growth(spark):
    sc = spark.sparkContext
    base_df = _edges_df(spark, [(v, (v + 1) % 20) for v in range(20)])
    prior_df = directed_pagerank(base_df, n_iter=2)
    before = len(sc._jsc.sc().getRDDStorageInfo())
    warm_pagerank(base_df, _edges_df(spark, [(0, 5)]), prior_df, n_iter=2).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # only the returned state survives
