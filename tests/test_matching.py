"""maximal_matching: exact Python replay of the derandomized rounds,
matching + maximality invariants, determinism across partitionings."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.functions.sampling import M31, _A1, _A2
from split_merge_partitioner_spark.graph import maximal_matching
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _lehmer(k, seed):
    h = ((k % M31 + M31) % M31 + seed % M31 + 1) % M31
    return ((h * _A1) % M31 + 1) * _A2 % M31


def _py_matching(edge_list, seed=42):
    alive = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    out = {}
    r = 0
    while alive:
        r += 1
        pr = {e: (_lehmer(e[0] * 1000003 + e[1], seed + r), *e) for e in alive}
        vmin: dict[int, tuple] = {}
        for e, k in pr.items():
            for v in e:
                if v not in vmin or k < vmin[v]:
                    vmin[v] = k
        winners = {e for e, k in pr.items() if vmin[e[0]] == k and vmin[e[1]] == k}
        for e in winners:
            out[e] = r
        matched_v = {v for e in winners for v in e}
        alive = {e for e in alive if e[0] not in matched_v and e[1] not in matched_v}
    return out


GRAPHS = {
    "path": [(i, i + 1) for i in range(15)],
    "star": [(0, i) for i in range(1, 12)],
    "clique": [(i, j) for i in range(7) for j in range(i + 1, 7)],
    "messy": [(5, 4), (4, 5), (6, 6), (1, 2), (2, 3)],
    "powerlaw": None,
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_matching_exact_replay_and_invariants(spark, name):
    edge_list = GRAPHS[name]
    if edge_list is None:
        pdf = powerlaw_edges_pdf(n=150, m_per_node=3)
        edge_list = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    df = spark.createDataFrame(edge_list, "src long, dst long")
    out, info = maximal_matching(df)
    assert info["converged"]
    got = {(r["src"], r["dst"]): r["round_matched"] for r in out.collect()}
    assert got == _py_matching(edge_list), name
    # invariants, replay-independent
    seen = [v for e in got for v in e]
    assert len(seen) == len(set(seen))  # no shared endpoints
    matched_v = set(seen)
    for a, b in edge_list:  # maximality: no augmenting edge remains
        if a != b:
            assert a in matched_v or b in matched_v


def test_matching_star_matches_one_edge(spark):
    df = spark.createDataFrame([(0, i) for i in range(1, 9)], "src long, dst long")
    out, _ = maximal_matching(df)
    assert out.count() == 1  # the hub can be matched once


def test_matching_deterministic_across_partitionings(spark):
    pdf = powerlaw_edges_pdf(n=120, m_per_node=3)
    df = spark.createDataFrame(pdf)
    a = sorted(map(tuple, maximal_matching(df.repartition(9))[0].collect()))
    b = sorted(map(tuple, maximal_matching(df.repartition(2))[0].collect()))
    assert a == b and len(a) > 0
