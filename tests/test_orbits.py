"""orbit_counts (per-vertex graphlet degree vectors): brute-force induced
4-subset enumeration oracle on random + structured graphs, global-census
consistency, sum identities, determinism."""

from __future__ import annotations

import itertools
import random
from collections import defaultdict

import pytest

from split_merge_partitioner_spark.graph import orbit_counts
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

ORBITS = [
    "deg", "p3_end", "p3_center", "tri", "p4_end", "p4_mid", "claw_leaf",
    "claw_center", "c4", "paw_tail", "paw_attach", "paw_tri",
    "diamond_side", "diamond_hub", "k4",
]

# marked patterns: edges, marked vertex (vertices 0..k-1)
PATTERNS = {
    "deg": ([(0, 1)], 0),
    "p3_end": ([(0, 1), (1, 2)], 0),
    "p3_center": ([(0, 1), (1, 2)], 1),
    "tri": ([(0, 1), (1, 2), (0, 2)], 0),
    "p4_end": ([(0, 1), (1, 2), (2, 3)], 0),
    "p4_mid": ([(0, 1), (1, 2), (2, 3)], 1),
    "claw_leaf": ([(0, 1), (0, 2), (0, 3)], 1),
    "claw_center": ([(0, 1), (0, 2), (0, 3)], 0),
    "c4": ([(0, 1), (1, 2), (2, 3), (3, 0)], 0),
    "paw_tail": ([(0, 1), (1, 2), (1, 3), (2, 3)], 0),
    "paw_attach": ([(0, 1), (1, 2), (1, 3), (2, 3)], 1),
    "paw_tri": ([(0, 1), (1, 2), (1, 3), (2, 3)], 2),
    "diamond_side": ([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], 0),
    "diamond_hub": ([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)], 1),
    "k4": ([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)], 0),
}


def _brute_orbits(edge_list):
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    verts = sorted(adj)
    out = {v: {o: 0 for o in ORBITS} for v in verts}

    def induced_orbit(S, v):
        E = {frozenset((a, b)) for a in S for b in S if a < b and b in adj[a]}
        for name, (pe, pm) in PATTERNS.items():
            k = max(max(e) for e in pe) + 1
            if k != len(S) or len(pe) != len(E):
                continue
            for perm in itertools.permutations(sorted(S)):
                if perm[pm] != v:
                    continue
                if all(frozenset((perm[a], perm[b])) in E for a, b in pe):
                    return name
        return None

    for k in (2, 3, 4):
        for S in itertools.combinations(verts, k):
            E = {frozenset((a, b)) for a in S for b in S if a < b and b in adj[a]}
            comp = {S[0]}
            grew = True
            while grew:
                grew = False
                for e in E:
                    a, b = tuple(e)
                    if (a in comp) != (b in comp):
                        comp |= {a, b}
                        grew = True
            if len(comp) != k:
                continue
            for v in S:
                t = induced_orbit(set(S), v)
                if t:
                    out[v][t] += 1
    return out


def _random_graph(seed, n, p):
    rnd = random.Random(seed)
    return [
        (a, b) for a in range(n) for b in range(a + 1, n) if rnd.random() < p
    ]


GRAPHS = {
    "k5": [(i, j) for i in range(5) for j in range(i + 1, 5)],
    "cycle6": [(i, (i + 1) % 6) for i in range(6)],
    "star_path": [(0, i) for i in range(1, 6)] + [(5, 6), (6, 7)],
    "gnp_sparse": _random_graph(11, 14, 0.25),
    "gnp_dense": _random_graph(12, 11, 0.55),
    "barbell": [(i, j) for i in range(4) for j in range(i + 1, 4)]
    + [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    + [(3, 10)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_orbits_vs_bruteforce(spark, name):
    el = GRAPHS[name]
    df = spark.createDataFrame(el, "src long, dst long")
    got = {
        r["vertex"]: {o: r[o] for o in ORBITS} for r in orbit_counts(df).collect()
    }
    assert got == _brute_orbits(el), name


def test_orbits_census_consistency(spark):
    # per-vertex orbit sums must reproduce the global induced census with
    # the right multiplicities (each graphlet credited once per member
    # vertex of the orbit)
    from split_merge_partitioner_spark.graph import graphlet_census4

    pdf = powerlaw_edges_pdf(n=120, m_per_node=3)
    df = spark.createDataFrame(pdf)
    per_v = orbit_counts(df).toPandas()
    cen = graphlet_census4(df).collect()[0]
    assert per_v["k4"].sum() == 4 * cen["k4"]
    assert per_v["diamond_hub"].sum() == 2 * cen["diamond"]
    assert per_v["diamond_side"].sum() == 2 * cen["diamond"]
    assert per_v["c4"].sum() == 4 * cen["c4"]
    assert per_v["paw_tail"].sum() == cen["tailed_triangle"]
    assert per_v["paw_attach"].sum() == cen["tailed_triangle"]
    assert per_v["paw_tri"].sum() == 2 * cen["tailed_triangle"]
    assert per_v["claw_center"].sum() == cen["claw"]
    assert per_v["claw_leaf"].sum() == 3 * cen["claw"]
    assert per_v["p4_end"].sum() == 2 * cen["path4"]
    assert per_v["p4_mid"].sum() == 2 * cen["path4"]
    assert per_v["tri"].sum() == 3 * cen["n_triangles"]
    assert per_v["deg"].sum() == 2 * cen["n_edges"]
    # non-negativity: induced counts can never go below zero
    assert (per_v[ORBITS] >= 0).all().all()


def test_orbits_repartition_determinism(spark):
    pdf = powerlaw_edges_pdf(n=100, m_per_node=3)
    a = spark.createDataFrame(pdf)
    b = a.repartition(7, "dst")
    ra = sorted(map(tuple, orbit_counts(a).collect()))
    rb = sorted(map(tuple, orbit_counts(b).collect()))
    assert ra == rb
