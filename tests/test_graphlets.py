"""Graphlet census tests: brute-force induced 4-subset enumeration on
random graphs (the ground truth the closed-form algebra must reproduce),
plus hand-checkable topologies."""

from __future__ import annotations

import random
from itertools import combinations

from split_merge_partitioner_spark.graph.graphlets import graphlet_census4


def _brute(rows):
    verts = sorted({v for e in rows for v in e})
    es = {(min(a, b), max(a, b)) for a, b in rows}
    counts = dict(k4=0, diamond=0, c4=0, tailed_triangle=0, claw=0, path4=0)
    for quad in combinations(verts, 4):
        sub = [(a, b) for a, b in combinations(quad, 2) if (a, b) in es]
        ne = len(sub)
        degs = sorted(
            sum(1 for e2 in sub if v in e2) for v in quad
        )
        if ne == 6:
            counts["k4"] += 1
        elif ne == 5:
            counts["diamond"] += 1
        elif ne == 4 and degs == [2, 2, 2, 2]:
            counts["c4"] += 1
        elif ne == 4 and degs == [1, 2, 2, 3]:
            counts["tailed_triangle"] += 1
        elif ne == 3 and degs == [1, 1, 1, 3]:
            counts["claw"] += 1
        elif ne == 3 and degs == [1, 1, 2, 2]:
            counts["path4"] += 1
        # (3 edges, degs [0,1,1,2] or triangle+isolate etc. are disconnected)
    return counts


def _rand_graph(seed, n=18, m=45):
    rng = random.Random(seed)
    seen = set()
    while len(seen) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            seen.add((min(a, b), max(a, b)))
    return sorted(seen)


def _census(spark, rows):
    df = spark.createDataFrame(rows, "src long, dst long")
    r = graphlet_census4(df).collect()[0]
    return {k: r[k] for k in
            ("k4", "diamond", "c4", "tailed_triangle", "claw", "path4")}


def test_census_matches_bruteforce(spark):
    for seed in (1, 2, 7):
        rows = _rand_graph(seed)
        assert _census(spark, rows) == _brute(rows), seed


def test_census_dense_block(spark):
    # K5: C(5,4) = 5 induced K4s and nothing else
    rows = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    got = _census(spark, rows)
    assert got == dict(k4=5, diamond=0, c4=0, tailed_triangle=0, claw=0, path4=0)


def test_census_sparse_shapes(spark):
    # a path on 5 vertices: P4s = 2, claws 0, nothing else
    rows = [(i, i + 1) for i in range(4)]
    got = _census(spark, rows)
    assert got == dict(k4=0, diamond=0, c4=0, tailed_triangle=0, claw=0, path4=2)
    # a star on 5 vertices: C(4,3) = 4 claws only
    rows = [(0, i) for i in range(1, 5)]
    got = _census(spark, rows)
    assert got == dict(k4=0, diamond=0, c4=0, tailed_triangle=0, claw=4, path4=0)
    # a 4-cycle plus one chord = diamond; plus the pure 4-cycle
    rows = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2)]
    got = _census(spark, rows)
    assert got == dict(k4=0, diamond=1, c4=0, tailed_triangle=0, claw=0, path4=0)
