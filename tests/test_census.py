"""Triadic census vs an independent brute-force classifier.

The brute force enumerates ALL C(n,3) triples and classifies each via
canonical-code isomorphism: the 6 direction bits of a triple are
canonicalized over all 6 vertex permutations and looked up in a table
built ONLY from the definitional edge lists of the 16 MAN types — no
shared code (and no shared closed-form math) with the operator.
"""

from __future__ import annotations

import random
from itertools import combinations, permutations

from split_merge_partitioner_spark.graph.census import TRIAD_TYPES, triadic_census

# definitional edge lists on vertices {0, 1, 2} (A=0, B=1, C=2),
# straight from the Holland-Leinhardt naming table
_DEFS = {
    "003": [],
    "012": [(0, 1)],
    "102": [(0, 1), (1, 0)],
    "021D": [(1, 0), (1, 2)],            # A<-B->C
    "021U": [(0, 1), (2, 1)],            # A->B<-C
    "021C": [(0, 1), (1, 2)],            # A->B->C
    "111D": [(0, 1), (1, 0), (2, 1)],    # A<->B<-C
    "111U": [(0, 1), (1, 0), (1, 2)],    # A<->B->C
    "030T": [(0, 1), (1, 2), (0, 2)],    # A->B->C, A->C
    "030C": [(0, 1), (1, 2), (2, 0)],    # A->B->C->A
    "201": [(0, 1), (1, 0), (1, 2), (2, 1)],                  # A<->B<->C
    "120D": [(1, 0), (1, 2), (0, 2), (2, 0)],                 # A<-B->C, A<->C
    "120U": [(0, 1), (2, 1), (0, 2), (2, 0)],                 # A->B<-C, A<->C
    "120C": [(0, 1), (1, 2), (0, 2), (2, 0)],                 # A->B->C, A<->C
    "210": [(0, 1), (1, 2), (2, 1), (0, 2), (2, 0)],          # A->B<->C, A<->C
    "300": [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 0)],
}

_BITS = [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]


def _code(edge_set) -> int:
    return sum(1 << i for i, e in enumerate(_BITS) if e in edge_set)


def _canon(edge_set) -> int:
    best = None
    for p in permutations(range(3)):
        c = _code({(p[u], p[v]) for (u, v) in edge_set})
        best = c if best is None else min(best, c)
    return best


_CANON_TO_NAME = {_canon(set(es)): name for name, es in _DEFS.items()}
assert len(_CANON_TO_NAME) == 16


def _brute_census(n: int, edges: set[tuple[int, int]]) -> dict[str, int]:
    out = {t: 0 for t in TRIAD_TYPES}
    for a, b, c in combinations(range(n), 3):
        sub = set()
        for i, (u, v) in enumerate([(a, b), (a, c), (b, c)]):
            if (u, v) in edges:
                sub.add((u, v))
            if (v, u) in edges:
                sub.add((v, u))
        local = {(a, b): (0, 1), (b, a): (1, 0), (a, c): (0, 2),
                 (c, a): (2, 0), (b, c): (1, 2), (c, b): (2, 1)}
        out[_CANON_TO_NAME[_canon({local[e] for e in sub})]] += 1
    return out


def _run(spark, n, edges):
    df = spark.createDataFrame(sorted(edges), "src long, dst long")
    # make every vertex 0..n-1 appear (census takes n from edge endpoints;
    # pad isolated vertices with a self-loop, which the op drops, would be
    # wrong — instead only test graphs where all vertices touch an edge)
    got = {r.triad_type: r.n_triads for r in triadic_census(df).collect()}
    assert set(got) == set(TRIAD_TYPES)
    return got


def test_census_pure_cycle(spark):
    edges = {(0, 1), (1, 2), (2, 0)}
    got = _run(spark, 3, edges)
    assert got["030C"] == 1 and sum(got.values()) == 1


def test_census_matches_bruteforce_random(spark):
    for seed in (7, 23, 101):
        rng = random.Random(seed)
        n = 13
        edges = set()
        for u in range(n):
            for v in range(n):
                if u != v and rng.random() < 0.22:
                    edges.add((u, v))
        # ensure every vertex appears (operator defines n from endpoints)
        for v in range(n):
            if not any(v in e for e in edges):
                edges.add((v, (v + 1) % n))
        got = _run(spark, n, edges)
        exp = _brute_census(n, edges)
        assert got == exp, f"seed {seed}: {got} != {exp}"


def test_census_mutual_heavy_graph(spark):
    # all-mutual 5-clique: every triple is 300
    edges = {(u, v) for u in range(5) for v in range(5) if u != v}
    got = _run(spark, 5, edges)
    assert got["300"] == 10 and sum(got.values()) == 10


def test_census_star_out(spark):
    # hub 0 -> 1..5: every hub triple is 021D, leaf-only triples are 012/003
    n = 6
    edges = {(0, v) for v in range(1, n)}
    got = _run(spark, n, edges)
    exp = _brute_census(n, edges)
    assert got == exp
    assert got["021D"] == 10  # C(5,2) triples through the hub
