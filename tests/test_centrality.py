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


# ---------------------------------------------------------------------------
# HITS hubs & authorities (directed, exact integer half-steps)
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import hits  # noqa: E402


def _hits_replay(pdf: pd.DataFrame, n_rounds: int):
    """Exact arbitrary-precision replay of the integer HITS half-steps."""
    out_adj: dict[int, list[int]] = {}
    in_adj: dict[int, list[int]] = {}
    for s, d in zip(pdf["src"], pdf["dst"]):
        out_adj.setdefault(int(s), []).append(int(d))
        in_adj.setdefault(int(d), []).append(int(s))
    h = {u: 1 for u in out_adj}
    a: dict[int, int] = {}
    for _ in range(n_rounds):
        a = {v: sum(h.get(u, 0) for u in ins) for v, ins in in_adj.items()}
        h = {u: sum(a.get(v, 0) for v in outs) for u, outs in out_adj.items()}
    mh, ma = max(h.values()), max(a.values())
    verts = set(out_adj) | set(in_adj)
    return {
        v: (round(h.get(v, 0) / mh, 6), round(a.get(v, 0) / ma, 6)) for v in verts
    }


def test_hits_exact_replay_directed(spark):
    # directed power-law-ish graph: reuse the undirected generator's pairs AS
    # directed src->dst edges (no doubling)
    pdf = powerlaw_edges_pdf(n=60, m_per_node=3)
    got = hits(spark.createDataFrame(pdf), n_rounds=4).toPandas().sort_values("vertex")
    exp = _hits_replay(pdf, 4)
    assert set(got["vertex"]) == set(exp)
    for v, hub, auth in zip(got["vertex"], got["hub"], got["auth"]):
        assert hub == pytest.approx(exp[int(v)][0], abs=1e-9), ("hub", v)
        assert auth == pytest.approx(exp[int(v)][1], abs=1e-9), ("auth", v)


def test_hits_bipartite_roles(spark):
    # pure bipartite customer->supplier shape: srcs are hubs only (auth 0),
    # dsts authorities only (hub 0); supplier 10 has 3 in-edges vs 1 -> top auth
    pdf = pd.DataFrame({"src": [0, 1, 2, 2], "dst": [10, 10, 10, 11]})
    got = hits(spark.createDataFrame(pdf), n_rounds=3).toPandas().set_index("vertex")
    assert np.all(got.loc[[0, 1, 2], "auth"].to_numpy() == 0.0)
    assert np.all(got.loc[[10, 11], "hub"].to_numpy() == 0.0)
    assert got.loc[10, "auth"] == 1.0
    assert got.loc[11, "auth"] < 1.0
    # vertex 2 points at both suppliers -> strictly the top hub
    assert got.loc[2, "hub"] == 1.0
    assert got.loc[0, "hub"] < 1.0


def test_hits_overflow_guard(spark):
    pdf = pd.DataFrame({"src": [0] * 12 + list(range(1, 13)),
                        "dst": list(range(1, 13)) + [0] * 12})
    with pytest.raises(ValueError, match="overflow"):
        hits(spark.createDataFrame(pdf), n_rounds=40)


def test_hits_empty(spark):
    df = spark.createDataFrame(pd.DataFrame({"src": [], "dst": []}), "src long, dst long")
    assert hits(df, n_rounds=3).count() == 0


def test_katz_matches_numpy_partial_sum(spark):
    """katz_centrality vs the exact integer recurrence in NumPy (object
    dtype — arbitrary precision)."""
    import numpy as np

    from split_merge_partitioner_spark.graph import katz_centrality

    es = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 4), (1, 4), (4, 5)]
    edges = spark.createDataFrame(es, "src long, dst long")
    got = {r["vertex"]: r["score"] for r in katz_centrality(edges, n_iter=5).collect()}
    n = 6
    A = np.zeros((n, n), dtype=object)
    for a, b in es:
        A[a, b] = A[b, a] = 1
    dmax = int(max(A.sum(axis=1)))
    c = dmax + 1
    y = np.ones(n, dtype=object)
    for k in range(1, 6):
        y = A @ y + np.full(n, c**k, dtype=object)
    mx = max(y)
    exp = {v: round(float(y[v]) / float(mx), 6) for v in range(n)}
    assert got == exp


def test_katz_overflow_guard(spark):
    import pytest as _pytest

    from split_merge_partitioner_spark.graph import katz_centrality

    star = [(0, i) for i in range(1, 40)]
    edges = spark.createDataFrame(star, "src long, dst long")
    with _pytest.raises(ValueError):
        katz_centrality(edges, n_iter=40)
    with _pytest.raises(ValueError):
        katz_centrality(edges, n_iter=2, attenuation_den=1)
