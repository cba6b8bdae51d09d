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


# ---------------------------------------------------------------------------
# edge betweenness
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import edge_betweenness


def _brandes_edges(pairs, seeds):
    """Exact Python Brandes edge accumulation (same δ = Σ term recursion)."""
    from collections import deque

    canon = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    adj: dict[int, list[int]] = {}
    for a, b in canon:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ebc: dict[tuple, float] = {e: 0.0 for e in canon}
    for s in sorted(set(seeds)):
        dist = {s: 0}
        sigma = {s: 1}
        order = [s]
        q = deque([s])
        while q:
            v = q.popleft()
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                    order.append(w)
                    sigma[w] = 0
                if dist[w] == dist[v] + 1:
                    sigma[w] += sigma[v]
        delta = {v: 0.0 for v in order}
        for w in reversed(order):
            if w == s:
                continue
            for u in adj.get(w, ()):
                if dist.get(u, -2) == dist[w] - 1:
                    term = ((1.0 + delta[w]) / sigma[w]) * sigma[u]
                    ebc[(min(u, w), max(u, w))] += term
                    delta[u] += term
    return {e: round(v / 2.0, 6) for e, v in ebc.items()}


def test_edge_betweenness_bridge_is_product_of_sides(spark):
    # two K3s joined by a bridge (2,3): with ALL seeds the bridge carries
    # every cross pair once per direction -> ebc = 3*3 = 9
    pairs = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = {(r.src, r.dst): r.ebc for r in edge_betweenness(df, seeds=list(range(6))).collect()}
    assert out[(2, 3)] == 9.0
    assert len(out) == len(pairs)  # every edge reports a row


def test_edge_betweenness_path_graph_exact(spark):
    # P5: edge (i, i+1) betweenness = (i+1) * (4-i)
    pairs = [(i, i + 1) for i in range(4)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = {(r.src, r.dst): r.ebc for r in edge_betweenness(df, seeds=list(range(5))).collect()}
    assert out == {(i, i + 1): float((i + 1) * (4 - i)) for i in range(4)}


def test_edge_betweenness_matches_python_replay(spark):
    import numpy as np

    rng = np.random.default_rng(13)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 25, size=(60, 2)) if a != b})
    seeds = [0, 3, 7, 11]
    df = spark.createDataFrame(pairs, "src long, dst long")
    got = {(r.src, r.dst): r.ebc for r in edge_betweenness(df, seeds=seeds).collect()}
    exp = _brandes_edges(pairs, seeds)
    assert got.keys() == exp.keys()
    for e in exp:
        assert got[e] == pytest.approx(exp[e], abs=1e-6)


def test_edge_betweenness_validation_and_release(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        edge_betweenness(df, seeds=[])
    sc = spark.sparkContext
    before = len(sc._jsc.sc().getRDDStorageInfo())
    edge_betweenness(df, seeds=[0, 1]).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # only the returned relation survives


# ---------------------------------------------------------------------------
# Girvan-Newman block step
# ---------------------------------------------------------------------------

from split_merge_partitioner_spark.graph import girvan_newman_split


def test_gn_split_cuts_the_bridge(spark):
    # two K3s + bridge: the bridge has max ebc, removing 1 edge splits the
    # graph into components rooted at the min ids 0 and 3
    pairs = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = {r.vertex: r.component
           for r in girvan_newman_split(df, seeds=list(range(6)), n_remove=1).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}


def test_gn_split_isolates_on_full_removal(spark):
    # removing every edge leaves each vertex its own component
    pairs = [(0, 1), (1, 2)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = {r.vertex: r.component
           for r in girvan_newman_split(df, seeds=[0, 1, 2], n_remove=2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


def test_gn_split_tie_break_is_lexicographic(spark):
    # P3 path: both edges tie (ebc 2.0 each with all seeds); n_remove=1 must
    # take (0,1) by the (src, dst) tie-break, leaving {0} and {1,2}
    pairs = [(0, 1), (1, 2)]
    df = spark.createDataFrame(pairs, "src long, dst long")
    out = {r.vertex: r.component
           for r in girvan_newman_split(df, seeds=[0, 1, 2], n_remove=1).collect()}
    assert out == {0: 0, 1: 1, 2: 1}


def test_gn_split_validation(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        girvan_newman_split(df, seeds=[0], n_remove=0)
