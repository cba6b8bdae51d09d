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


def _py_weighted_matching(wedges, seed=42):
    WCAP = 2_097_151
    alive = {tuple(sorted(e)): w for e, w in wedges.items() if e[0] != e[1]}
    out = {}
    r = 0
    while alive:
        r += 1
        pr = {
            e: (WCAP - w, _lehmer(e[0] * 1000003 + e[1], seed + r), *e)
            for e, w in alive.items()
        }
        vmin: dict[int, tuple] = {}
        for e, k in pr.items():
            for v in e:
                if v not in vmin or k < vmin[v]:
                    vmin[v] = k
        winners = {e for e, k in pr.items() if vmin[e[0]] == k and vmin[e[1]] == k}
        for e in winners:
            out[e] = r
        mv = {v for e in winners for v in e}
        alive = {e: w for e, w in alive.items() if e[0] not in mv and e[1] not in mv}
    return out


def test_heavy_edge_matching_prefers_weight(spark):
    """On a 3-path with a heavy middle... actually a star with one heavy
    spoke: the heavy edge must win regardless of hash order, and the exact
    replay agrees."""
    wedges = {(0, 1): 100, (0, 2): 1, (0, 3): 1, (2, 3): 1}
    df = spark.createDataFrame(
        [(a, b, w) for (a, b), w in wedges.items()], "src long, dst long, shared long"
    )
    out, info = maximal_matching(df, weight_col="shared")
    got = {(r["src"], r["dst"]): r["round_matched"] for r in out.collect()}
    assert got == _py_weighted_matching(wedges)
    assert (0, 1) in got  # the heavy edge always wins its neighborhood


def test_heavy_edge_matching_rejects_bad_weights(spark):
    df = spark.createDataFrame([(0, 1, 0)], "src long, dst long, shared long")
    with pytest.raises(ValueError, match="weights outside"):
        maximal_matching(df, weight_col="shared")


def test_coarsen_graph_by_hand(spark):
    """4-cycle with one heavy edge: (0,1,w=9) contracts first; the coarse
    graph merges the two parallel edges between rep 0 and the other pair's
    rep with summed weight; mapping covers every vertex."""
    from split_merge_partitioner_spark.graph import coarsen_graph

    df = spark.createDataFrame(
        [(0, 1, 9), (1, 2, 1), (2, 3, 8), (3, 0, 1)], "src long, dst long, shared long"
    )
    coarse, mapping, info = coarsen_graph(df)
    assert info["converged"]
    mp = {r["vertex"]: r["rep"] for r in mapping.collect()}
    assert mp[0] == mp[1] == 0 and mp[2] == mp[3] == 2  # both heavy edges contract
    rows = coarse.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["src"], r["dst"], r["weight"]) == (0, 2, 2)  # 1-2 and 3-0 merge: 1+1


def test_coarsen_graph_shrinks_and_conserves_weight(spark):
    """On the weighted projection-like graph: coarse vertex count <= input,
    and total weight = input total minus intra-pair (contracted) weight."""
    from split_merge_partitioner_spark.graph import coarsen_graph

    pdf = powerlaw_edges_pdf(n=150, m_per_node=3)
    el = {tuple(sorted(e)) for e in zip(pdf["src"].tolist(), pdf["dst"].tolist())
          if e[0] != e[1]}
    df = spark.createDataFrame(
        [(a, b, (a + b) % 5 + 1) for a, b in el], "src long, dst long, shared long"
    )
    coarse, mapping, _ = coarsen_graph(df)
    n_in = mapping.count()
    n_out = mapping.select("rep").distinct().count()
    assert n_out < n_in
    w_in = sum((a + b) % 5 + 1 for a, b in el)
    matched = _py_weighted_matching({(a, b): (a + b) % 5 + 1 for a, b in el})
    w_contracted = sum((a + b) % 5 + 1 for a, b in matched)
    w_out = coarse.agg({"weight": "sum"}).collect()[0][0]
    assert w_out == w_in - w_contracted
