"""densest_subgraph_peel: exact Python replay of the (1+ε)-batched Charikar
peel, planted-clique recovery, and edge cases."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.graph import densest_subgraph_peel
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _peel_replay(edge_list, rounds, enum, eden):
    cur = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    out = []
    for r in range(rounds + 1):
        deg: dict[int, int] = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        n, m = len(deg), len(cur)
        if n == 0:
            break
        out.append((r, n, m, round(m / n, 6)))
        if r == rounds:
            break
        keep = {v for v, c in deg.items() if c * n * eden > 2 * m * enum}
        cur = {(a, b) for a, b in cur if a in keep and b in keep}
    best = max(out, key=lambda t: (t[3], -t[0]))[0] if out else None
    return out, best


def _planted():
    """Sparse power-law background + a planted 12-clique on fresh ids."""
    pdf = powerlaw_edges_pdf(n=200, m_per_node=2)
    edges = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    clique = [(2000 + i, 2000 + j) for i in range(12) for j in range(i + 1, 12)]
    return edges + clique


@pytest.mark.parametrize("enum,eden", [(11, 10), (3, 2), (1, 1)])
def test_densest_peel_exact_replay(spark, enum, eden):
    edges = _planted()
    df = spark.createDataFrame(edges, "src long, dst long")
    got = [
        (r["round"], r["n_vertices"], r["n_edges"], r["density"], r["is_best"])
        for r in densest_subgraph_peel(df, rounds=6, enum=enum, eden=eden)
        .orderBy("round")
        .collect()
    ]
    exp, best = _peel_replay(edges, 6, enum, eden)
    assert [(g[0], g[1], g[2]) for g in got] == [(e[0], e[1], e[2]) for e in exp]
    for g, e in zip(got, exp):
        assert g[3] == pytest.approx(e[3], abs=1e-9)
    assert [g[0] for g in got if g[4]] == [best]


def test_densest_peel_finds_planted_clique(spark):
    """The best round's density approaches the 12-clique's (12·11/2)/12 = 5.5
    — far above the sparse background — proving the peel isolates it."""
    df = spark.createDataFrame(_planted(), "src long, dst long")
    rows = densest_subgraph_peel(df, rounds=8).collect()
    best = next(r for r in rows if r["is_best"])
    assert best["density"] >= 4.0
    assert best["round"] > 0  # the whole graph is NOT the densest subgraph


def test_densest_peel_validation_and_degenerate(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    rows = densest_subgraph_peel(df, rounds=4).collect()
    # a single edge: round 0 density 0.5; peel removes both endpoints
    assert rows[0]["n_vertices"] == 2 and rows[0]["density"] == 0.5
    with pytest.raises(ValueError):
        densest_subgraph_peel(df, rounds=-1)
    with pytest.raises(ValueError):
        densest_subgraph_peel(df, enum=1, eden=2)  # epsilon < 0
    empty = spark.createDataFrame([], "src long, dst long")
    assert densest_subgraph_peel(empty, rounds=3).count() == 0
