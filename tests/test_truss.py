"""k-truss (graph/truss.py) vs an exact Python peeling replay."""

from __future__ import annotations

import pandas as pd
import pytest

from split_merge_partitioner_spark.graph.truss import ktruss
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _truss_replay(pairs: list[tuple[int, int]], k: int) -> dict[tuple[int, int], int]:
    """To-fixpoint peeling with exact support recount; returns the surviving
    canonical edges with their within-subgraph support."""
    edges = {(min(a, b), max(a, b)) for a, b in pairs if a != b}

    def support(es: set) -> dict[tuple[int, int], int]:
        adj: dict[int, set[int]] = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        return {
            (a, b): len(adj[a] & adj[b]) for a, b in es
        }

    while True:
        sup = support(edges)
        keep = {e for e in edges if sup[e] >= k - 2}
        if keep == edges:
            return {e: sup[e] for e in edges}
        edges = keep
        if not edges:
            return {}


def test_ktruss_two_cliques_bridge(spark):
    # two K5s + a bridge: the 5-truss is exactly the two cliques (every clique
    # edge has support 3 within its K5); the bridge and nothing else peels off
    cl1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    cl2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    pairs = cl1 + cl2 + [(4, 10)]
    e = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    got = {
        (int(r["src"]), int(r["dst"])): int(r["support"])
        for r in ktruss(e, k=5).collect()
    }
    assert got == _truss_replay(pairs, 5)
    assert set(got) == set(cl1) | set(cl2)
    assert all(s == 3 for s in got.values())


def test_ktruss_matches_replay_on_powerlaw(spark):
    pdf = powerlaw_edges_pdf(n=80, m_per_node=4)
    pairs = list(zip(pdf["src"].astype(int), pdf["dst"].astype(int)))
    e = spark.createDataFrame(pdf)
    for k in (3, 4):
        got = {
            (int(r["src"]), int(r["dst"])): int(r["support"])
            for r in ktruss(e, k=k, max_rounds=50).collect()
        }
        assert got == _truss_replay(pairs, k), k


def test_ktruss_orientations_agree(spark):
    pdf = powerlaw_edges_pdf(n=60, m_per_node=4)
    e = spark.createDataFrame(pdf)
    a = sorted(map(tuple, ktruss(e, k=4, orient="degree").collect()))
    b = sorted(map(tuple, ktruss(e, k=4, orient="id").collect()))
    assert a == b


def test_ktruss_everything_peels(spark):
    # a tree has no triangles: any k >= 3 truss is empty
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    e = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    assert ktruss(e, k=3).count() == 0


def test_ktruss_validation(spark):
    e = spark.createDataFrame(pd.DataFrame({"src": [0], "dst": [1]}))
    with pytest.raises(ValueError, match="k must be"):
        ktruss(e, k=2)
    with pytest.raises(ValueError, match="max_rounds"):
        ktruss(e, k=3, max_rounds=0)
