"""scan_clusters: exact Python replay of SCAN (KDD'07, closed-neighborhood
similarity, integer squared predicate), role/cluster invariants, edge cases
(no similar edges, everything similar), determinism under repartition."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from split_merge_partitioner_spark.graph import scan_clusters
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _py_scan(edge_list, eps_num, eps_den, mu):
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    verts = sorted(adj)

    def similar(u, v):
        c = len(adj[u] & adj[v]) + 2
        gu, gv = len(adj[u]) + 1, len(adj[v]) + 1
        return c * c * eps_den * eps_den >= eps_num * eps_num * gu * gv

    sim = {e for e in edges if similar(*e)}
    simadj: dict[int, set[int]] = defaultdict(set)
    for a, b in sim:
        simadj[a].add(b)
        simadj[b].add(a)
    cores = {v for v in verts if len(simadj[v]) + 1 >= mu}
    # components of cores over core-core similar edges, label = min vertex
    cluster: dict[int, int] = {}
    for root in sorted(cores):
        if root in cluster:
            continue
        comp, stack = {root}, [root]
        while stack:
            x = stack.pop()
            for y in simadj[x]:
                if y in cores and y not in comp:
                    comp.add(y)
                    stack.append(y)
        lbl = min(comp)
        for x in comp:
            cluster[x] = lbl
    roles = {}
    for v in verts:
        if v in cores:
            roles[v] = ("core", cluster[v])
    for v in verts:
        if v in cores:
            continue
        attach = [cluster[u] for u in simadj[v] if u in cores]
        if attach:
            roles[v] = ("border", min(attach))
    clustered = {v: c for v, (_, c) in roles.items()}
    for v in verts:
        if v in roles:
            continue
        ks = {clustered[u] for u in adj[v] if u in clustered}
        roles[v] = ("hub" if len(ks) >= 2 else "outlier", -1)
    return roles


GRAPHS = {
    # two triangles joined by a bridge vertex: classic SCAN hub shape
    "two_tri_hub": [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 6), (6, 3)],
    "clique_plus_tail": [(i, j) for i in range(5) for j in range(i + 1, 5)]
    + [(4, 10), (10, 11)],
    "path": [(i, i + 1) for i in range(12)],
    "two_cliques_shared": [(i, j) for i in range(4) for j in range(i + 1, 4)]
    + [(i, j) for i in range(3, 7) for j in range(i + 1, 7)],
    "powerlaw": None,
}


def _edge_list(name):
    el = GRAPHS[name]
    if el is None:
        pdf = powerlaw_edges_pdf(n=150, m_per_node=3)
        el = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    return el


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_scan_exact_replay(spark, name):
    el = _edge_list(name)
    df = spark.createDataFrame(el, "src long, dst long")
    got = {
        r["vertex"]: (r["role"], r["cluster"])
        for r in scan_clusters(df, eps_num=7, eps_den=10, mu=3).collect()
    }
    exp = _py_scan(el, 7, 10, 3)
    assert got == exp, name


def test_scan_role_invariants(spark):
    el = _edge_list("powerlaw")
    df = spark.createDataFrame(el, "src long, dst long")
    rows = scan_clusters(df, eps_num=6, eps_den=10, mu=3).collect()
    by_role = defaultdict(list)
    for r in rows:
        by_role[r["role"]].append(r)
    # every core/border carries a real cluster id; hubs/outliers carry -1
    assert all(r["cluster"] >= 0 for r in by_role["core"] + by_role["border"])
    assert all(r["cluster"] == -1 for r in by_role["hub"] + by_role["outlier"])
    # cluster labels are cluster minima, and each cluster has >= 1 core
    cores_by_cluster = defaultdict(list)
    for r in by_role["core"]:
        cores_by_cluster[r["cluster"]].append(r["vertex"])
    members = defaultdict(list)
    for r in by_role["core"] + by_role["border"]:
        members[r["cluster"]].append(r["vertex"])
    for c, vs in members.items():
        assert min(vs) == c
        assert cores_by_cluster[c], f"cluster {c} has no core"


def test_scan_eps_extremes(spark):
    el = _edge_list("two_tri_hub")
    df = spark.createDataFrame(el, "src long, dst long")
    # eps = 1: only perfectly-similar edges survive -> replay agrees
    got = {
        r["vertex"]: (r["role"], r["cluster"])
        for r in scan_clusters(df, eps_num=1, eps_den=1, mu=3).collect()
    }
    assert got == _py_scan(el, 1, 1, 3)
    # tiny eps: everything similar -> one cluster of cores covering the graph
    rows = scan_clusters(df, eps_num=1, eps_den=100, mu=2).collect()
    assert {r["role"] for r in rows} == {"core"}
    assert {r["cluster"] for r in rows} == {0}


def test_scan_repartition_determinism(spark):
    el = _edge_list("powerlaw")
    a = spark.createDataFrame(el, "src long, dst long")
    b = a.repartition(7, "dst")
    ra = sorted(map(tuple, scan_clusters(a, 7, 10, 3).collect()))
    rb = sorted(map(tuple, scan_clusters(b, 7, 10, 3).collect()))
    assert ra == rb


def test_scan_validations(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        scan_clusters(df, eps_num=11, eps_den=10)
    with pytest.raises(ValueError):
        scan_clusters(df, mu=1)


def test_scan_sigma_matches_float_formula(spark):
    # the integer predicate is the squared float sigma >= eps, verified on
    # every edge of a random graph at several eps
    el = _edge_list("powerlaw")
    adj = defaultdict(set)
    for a, b in {tuple(sorted(e)) for e in el if e[0] != e[1]}:
        adj[a].add(b)
        adj[b].add(a)
    for en, ed in [(7, 10), (1, 2), (9, 10)]:
        for u in list(adj)[:40]:
            for v in adj[u]:
                c = len(adj[u] & adj[v]) + 2
                sig = c / math.sqrt((len(adj[u]) + 1) * (len(adj[v]) + 1))
                int_pred = c * c * ed * ed >= en * en * (len(adj[u]) + 1) * (
                    len(adj[v]) + 1
                )
                # strict disagreement only possible at exact equality ties,
                # where the integer form is the definition
                if abs(sig - en / ed) > 1e-12:
                    assert int_pred == (sig >= en / ed)
