"""simrank_mc (graph/simrank.py) vs a driver-side aggregation of the same
walk corpus, plus the estimator laws (adjacent>distant, no-meet zeros,
u==v rejection, weight table exactness)."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.graph import random_walks, simrank_mc


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _expected(corpus_rows, qpairs, L, c_num, c_den):
    by_sw = {}
    for r in corpus_rows:
        by_sw.setdefault((r.start, r.walk), {})[r.step] = r.vertex
    out = {}
    walks = sorted({w for (_, w) in by_sw})
    for u, v in qpairs:
        taus = []
        for w in walks:
            a, b = by_sw.get((u, w), {}), by_sw.get((v, w), {})
            tau = next(
                (t for t in range(1, L + 1) if t in a and t in b and a[t] == b[t]),
                None,
            )
            if tau is not None:
                taus.append(tau)
        out[(u, v)] = (
            len(taus),
            min(taus) if taus else None,
            sum(c_num**t * c_den ** (L - t) for t in taus),
        )
    return out


def test_matches_corpus_aggregation(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    df = spark.createDataFrame(powerlaw_edges_pdf(n=60, m_per_node=3, seed=6))
    L, W = 5, 4
    corpus = random_walks(df, walk_length=L, walks_per_vertex=W, seed=11).collect()
    qpairs = [(0, 1), (2, 5), (10, 40), (3, 59)]
    qp = spark.createDataFrame(qpairs, "u long, v long")
    got = {
        (r.u, r.v): (r.n_meets, r.min_tau, r.score_num)
        for r in simrank_mc(df, qp, walk_length=L, walks_per_vertex=W, seed=11).collect()
    }
    want = _expected(corpus, qpairs, L, 6, 10)
    # no-meet pairs report score_num 0 (not NULL)
    want = {k: (n, t, s) for k, (n, t, s) in want.items()}
    assert got == want


def test_adjacent_beats_distant_on_barbell(spark):
    # two K4 cliques joined by one long path: within-clique pairs meet,
    # cross pairs at distance 6 do not (L=4)
    k1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    k2 = [(10 + i, 10 + j) for i in range(4) for j in range(i + 1, 4)]
    path = [(3, 20), (20, 21), (21, 22), (22, 10)]
    df = _df(spark, k1 + k2 + path)
    qp = spark.createDataFrame([(0, 1), (0, 11)], "u long, v long")
    got = {
        (r.u, r.v): r.score_num
        for r in simrank_mc(df, qp, walk_length=4, walks_per_vertex=8, seed=3).collect()
    }
    assert got[(0, 1)] > got[(0, 11)]


def test_equal_endpoints_rejected(spark):
    df = _df(spark, [(0, 1)])
    qp = spark.createDataFrame([(0, 0)], "u long, v long")
    with pytest.raises(ValueError, match="u != v"):
        simrank_mc(df, qp)


def test_weight_guard(spark):
    df = _df(spark, [(0, 1)])
    qp = spark.createDataFrame([(0, 1)], "u long, v long")
    with pytest.raises(ValueError, match="2\\^53"):
        simrank_mc(df, qp, walk_length=18, c_den=10)
    with pytest.raises(ValueError):
        simrank_mc(df, qp, c_num=10, c_den=10)


def test_no_net_storage_growth(spark):
    sc = spark.sparkContext
    df = _df(spark, [(i, i + 1) for i in range(12)])
    qp = spark.createDataFrame([(0, 3), (1, 5)], "u long, v long")
    before = len(sc._jsc.sc().getRDDStorageInfo())
    simrank_mc(df, qp, walk_length=4, walks_per_vertex=2).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # corpus released; only the result lives
