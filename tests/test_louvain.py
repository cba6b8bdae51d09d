"""louvain_local_move / contract_by_community (graph/louvain.py): clique
recovery, an independent pure-Python replay of the documented synchronous
parity-gated semantics, contraction hand-values, and the storage-release
budget."""

from __future__ import annotations

from collections import defaultdict

import pytest

from split_merge_partitioner_spark.graph import (
    contract_by_community,
    louvain_local_move,
)


def _py_louvain(es, n_rounds):
    """Literal replay of the module contract: score = 2m*w(u,C) -
    k_u*(tot(C) - [C==cu]*k_u), argmax (score desc, c asc), move only when
    (u + r) % 2 == 0."""
    und = defaultdict(list)
    for a, b in es:
        und[a].append(b)
        und[b].append(a)
    k = {u: len(vs) for u, vs in und.items()}
    m2 = sum(k.values())
    comm = {u: u for u in und}
    for r in range(1, n_rounds + 1):
        tot = defaultdict(int)
        for u in und:
            tot[comm[u]] += k[u]
        new = {}
        for u in und:
            w = defaultdict(int)
            for v in und[u]:
                w[comm[v]] += 1
            w.setdefault(comm[u], w.get(comm[u], 0))
            best = min(
                w,
                key=lambda c: (
                    -(m2 * w[c] - k[u] * (tot[c] - (k[u] if c == comm[u] else 0))),
                    c,
                ),
            )
            new[u] = best if (u + r) % 2 == 0 else comm[u]
        comm = new
    return comm


def _rand_edges(seed, n=60, m=150):
    es, x = set(), seed
    while len(es) < m:
        x = (x * 48271 + 11) % 2147483647
        a = x % n
        x = (x * 48271 + 11) % 2147483647
        b = x % n
        if a != b:
            es.add((min(a, b), max(a, b)))
    return sorted(es)


def test_louvain_recovers_cliques(spark):
    cl1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    cl2 = [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
    edges = spark.createDataFrame(cl1 + cl2 + [(5, 10)], "src long, dst long")
    out, info = louvain_local_move(edges, n_rounds=4)
    groups = defaultdict(set)
    for r in out.collect():
        groups[r["comm"]].add(r["vertex"])
    assert sorted(map(sorted, groups.values())) == [
        list(range(6)),
        list(range(10, 16)),
    ]
    assert info["n_communities"] == 2
    assert info["moves"][-1] == 0  # settled


@pytest.mark.parametrize("seed", [3, 17])
def test_louvain_matches_python_replay(spark, seed):
    es = _rand_edges(seed)
    edges = spark.createDataFrame(es, "src long, dst long")
    out, _ = louvain_local_move(edges, n_rounds=3)
    got = {r["vertex"]: r["comm"] for r in out.collect()}
    assert got == _py_louvain(es, 3)


def test_louvain_validates(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        louvain_local_move(edges, n_rounds=0)


def test_contract_by_community_hand_values(spark):
    # triangle {0,1,2} + edge to 3; comms {0,1,2}->0, {3}->3
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "src long, dst long"
    )
    comms = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "vertex long, comm long"
    )
    got = sorted(map(tuple, contract_by_community(edges, comms).collect()))
    assert got == [(0, 0, 3), (0, 3, 1)]


def test_louvain_releases_storage(spark):
    from tests.test_storage_release import RESULT_BUDGET, _new_after, _path_edges

    edges = _path_edges(spark)
    new, leaked = _new_after(
        spark, lambda: louvain_local_move(edges, n_rounds=3)[0]
    )
    assert new >= 1
    assert leaked <= RESULT_BUDGET


def _py_louvain_w(es, n_rounds):
    """Weighted/self-loop-aware replay: es = [(a, b, w)]; loops add 2w to
    k and nothing to any w(u, C)."""
    und, k = defaultdict(list), defaultdict(int)
    for a, b, w in es:
        if a == b:
            k[a] += 2 * w
            continue
        und[a].append((b, w))
        und[b].append((a, w))
        k[a] += w
        k[b] += w
    m2 = sum(k.values())
    comm = {u: u for u in k}
    for r in range(1, n_rounds + 1):
        tot = defaultdict(int)
        for u in k:
            tot[comm[u]] += k[u]
        new = {}
        for u in k:
            w = defaultdict(int)
            for v, wt in und.get(u, []):
                w[comm[v]] += wt
            w.setdefault(comm[u], w.get(comm[u], 0))
            best = min(
                w,
                key=lambda c: (
                    -(m2 * w[c] - k[u] * (tot[c] - (k[u] if c == comm[u] else 0))),
                    c,
                ),
            )
            new[u] = best if (u + r) % 2 == 0 else comm[u]
        comm = new
    return comm


def _py_contract(es, comm):
    agg = defaultdict(int)
    for a, b, w in es:
        ca, cb = comm[a], comm[b]
        agg[(min(ca, cb), max(ca, cb))] += w
    return [(a, b, w) for (a, b), w in agg.items()]


@pytest.mark.parametrize("seed", [5])
def test_full_louvain_matches_python_replay(spark, seed):
    from split_merge_partitioner_spark.graph import louvain

    es = _rand_edges(seed, n=50, m=120)
    edges = spark.createDataFrame(es, "src long, dst long")
    out, info = louvain(edges, n_levels=2, n_rounds=3)
    got = {r["vertex"]: r["comm"] for r in out.collect()}
    # replay: level 1 on unit weights, contract, level 2 weighted, compose
    c1 = _py_louvain_w([(a, b, 1) for a, b in es], 3)
    cg = _py_contract([(a, b, 1) for a, b in es], c1)
    c2 = _py_louvain_w(cg, 3)
    exp = {v: c2[c1[v]] for v in c1}
    assert got == exp
    assert info["n_communities"] == len(set(exp.values()))
    assert len(info["levels"]) == 2


def test_weighted_louvain_validates_nonpositive(spark):
    from split_merge_partitioner_spark.graph import louvain_local_move

    edges = spark.createDataFrame(
        [(0, 1, 0)], "src long, dst long, weight long"
    )
    with pytest.raises(ValueError):
        louvain_local_move(edges, n_rounds=1, weight_col="weight")


def test_full_louvain_releases_storage(spark):
    from split_merge_partitioner_spark.graph import louvain
    from tests.test_storage_release import RESULT_BUDGET, _new_after, _path_edges

    edges = _path_edges(spark)
    new, leaked = _new_after(spark, lambda: louvain(edges, 2, 2)[0])
    assert new >= 1
    assert leaked <= RESULT_BUDGET


def test_weighted_modularity_level_invariance(spark):
    """Q(contract(G, C), identity labels, weighted) == Q(G, C): the
    textbook Louvain level-invariance — validates the weighted modularity
    path and the self-loop conventions of contract_by_community in one
    equation."""
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.graph import louvain_local_move
    from split_merge_partitioner_spark.graph.modularity import modularity

    es = _rand_edges(7, n=40, m=100)
    edges = spark.createDataFrame(es, "src long, dst long")
    comms, _ = louvain_local_move(edges, n_rounds=3)
    q_fine = modularity(
        edges, comms.select("vertex", F.col("comm").alias("label"))
    ).collect()[0]
    cg = contract_by_community(edges, comms)
    q_coarse = modularity(
        cg,
        cg.select(F.col("src").alias("vertex"))
        .unionAll(cg.select(F.col("dst")))
        .distinct()
        .select("vertex", F.col("vertex").alias("label")),
        weight_col="weight",
    ).collect()[0]
    assert q_fine["modularity"] == q_coarse["modularity"]
    assert q_coarse["m_edges"] == len(es)  # total weight preserved


def test_conductance_hand_values(spark):
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.graph.modularity import conductance

    # triangle {0,1,2} + edge (2,3): labels {0,1,2}->0, {3}->3
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (2, 3)], "src long, dst long"
    )
    labels = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 3)], "vertex long, label long"
    )
    got = {r["label"]: r for r in conductance(edges, labels).collect()}
    # vol(0) = 2+2+3 = 7, cut = 1, min(7, 8-7)=1 -> phi=1.0
    assert (got[0]["vol"], got[0]["cut"], got[0]["conductance_ppm"]) == (7, 1, 10**6)
    # vol(3) = 1, cut = 1 -> phi = 1.0
    assert (got[3]["vol"], got[3]["cut"], got[3]["conductance_ppm"]) == (1, 1, 10**6)


def test_conductance_well_separated_cliques(spark):
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.graph import louvain_local_move
    from split_merge_partitioner_spark.graph.modularity import conductance

    cl1 = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    cl2 = [(i, j) for i in range(10, 16) for j in range(i + 1, 16)]
    edges = spark.createDataFrame(cl1 + cl2 + [(5, 10)], "src long, dst long")
    labels = louvain_local_move(edges, n_rounds=4)[0].select(
        "vertex", F.col("comm").alias("label")
    )
    rows = conductance(edges, labels).collect()
    assert len(rows) == 2
    # each clique: vol = 2*15+1 = 31, cut = 1 -> phi = 1e6//31
    for r in rows:
        assert (r["vol"], r["cut"], r["conductance_ppm"]) == (31, 1, 10**6 // 31)
