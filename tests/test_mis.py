"""maximal_independent_set: independence + maximality invariants on varied
graphs, exact Python replay of the derandomized Luby rounds, determinism."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.functions.sampling import M31, _A1, _A2
from split_merge_partitioner_spark.graph import maximal_independent_set
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _lehmer(k, seed):
    h = ((k % M31 + M31) % M31 + seed % M31 + 1) % M31
    return ((h * _A1) % M31 + 1) * _A2 % M31


def _py_mis(edge_list, seed=42):
    adj: dict[int, set[int]] = {}
    verts = set()
    for a, b in edge_list:
        verts |= {a, b}
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    alive = set(verts)
    out: dict[int, int] = {}
    r = 0
    while alive:
        r += 1
        pr = {v: (_lehmer(v, seed + r), v) for v in alive}
        winners = {
            v
            for v in alive
            if all(pr[v] < pr[w] for w in adj.get(v, ()) if w in alive)
        }
        for v in winners:
            out[v] = r
        dominated = {w for v in winners for w in adj.get(v, ()) if w in alive}
        alive -= winners | dominated
    return {v: out.get(v, 0) for v in verts}


GRAPHS = {
    "path": [(i, i + 1) for i in range(20)],
    "star": [(0, i) for i in range(1, 15)],
    "clique": [(i, j) for i in range(8) for j in range(i + 1, 8)],
    "powerlaw": None,  # filled in the test
    "messy": [(5, 4), (4, 5), (6, 6), (1, 2)],  # dups, reversed, self-loop
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_mis_exact_replay_and_invariants(spark, name):
    edge_list = GRAPHS[name]
    if edge_list is None:
        pdf = powerlaw_edges_pdf(n=200, m_per_node=3)
        edge_list = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    df = spark.createDataFrame(edge_list, "src long, dst long")
    out, info = maximal_independent_set(df)
    assert info["converged"]
    got = {r["vertex"]: r["round_selected"] for r in out.collect()}
    assert got == _py_mis(edge_list), name
    # invariants, independent of the replay
    mis = {v for v, r in got.items() if r > 0}
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    assert all(not (adj.get(v, set()) & mis) for v in mis)          # independent
    assert all(adj.get(v, set()) & mis for v in got if v not in mis)  # maximal


def test_mis_clique_selects_exactly_one(spark):
    df = spark.createDataFrame(
        [(i, j) for i in range(6) for j in range(i + 1, 6)], "src long, dst long"
    )
    out, _ = maximal_independent_set(df)
    assert sum(r["in_mis"] for r in out.collect()) == 1


def test_mis_deterministic_across_runs(spark):
    pdf = powerlaw_edges_pdf(n=150, m_per_node=3)
    df = spark.createDataFrame(pdf).repartition(7)
    a = sorted(map(tuple, maximal_independent_set(df)[0].collect()))
    b = sorted(map(tuple, maximal_independent_set(df.repartition(3))[0].collect()))
    assert a == b
