"""kclique_count (graph/triangles.py) vs closed forms and a brute-force replay."""

from __future__ import annotations

from itertools import combinations
from math import comb

import pytest

from split_merge_partitioner_spark.graph import kclique_count, triangle_count
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _df(spark, pairs):
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in pairs], "src long, dst long"
    ).distinct()


def _brute(pairs, k):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    verts = sorted({v for e in es for v in e})
    return sum(
        1
        for c in combinations(verts, k)
        if all((a, b) in es for a, b in combinations(c, 2))
    )


def test_complete_graph_closed_form(spark):
    # K6: C(6,k) k-cliques for every k
    k6 = _df(spark, [(i, j) for i in range(6) for j in range(i + 1, 6)])
    for k in (2, 3, 4, 5, 6):
        assert kclique_count(k6, k=k) == comb(6, k)
    assert kclique_count(k6, k=7) == 0


def test_k4_minus_edge_has_no_4clique(spark):
    pairs = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3)]  # K4 minus (2,3)
    e = _df(spark, pairs)
    assert kclique_count(e, k=4) == 0
    assert kclique_count(e, k=3) == 2  # the two triangles through edge (0,1)


def test_two_k4_sharing_a_triangle(spark):
    # {0,1,2,3} and {0,1,2,4}: 2 distinct 4-cliques, no 5-clique (3-4 missing)
    pairs = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    pairs += [(0, 4), (1, 4), (2, 4)]
    e = _df(spark, pairs)
    assert kclique_count(e, k=4) == 2
    assert kclique_count(e, k=5) == 0


def test_matches_bruteforce_and_triangles_on_powerlaw(spark):
    pdf = powerlaw_edges_pdf(n=120, m_per_node=6, seed=7)
    pairs = list(zip(pdf["src"], pdf["dst"]))
    e = spark.createDataFrame(pdf)
    assert kclique_count(e, k=3) == triangle_count(e)
    assert kclique_count(e, k=4) == _brute(pairs, 4)
    assert kclique_count(e, k=2) == len(pairs)


def test_orientation_invariance(spark):
    e = spark.createDataFrame(powerlaw_edges_pdf(n=150, m_per_node=5, seed=11))
    assert kclique_count(e, k=4, orient="id") == kclique_count(e, k=4, orient="degree")


def test_rejects_bad_k(spark):
    e = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        kclique_count(e, k=1)


# ---------------------------------------------------------------------------
# square_count (4-cycles, codegree identity)
# ---------------------------------------------------------------------------

def _brute_squares(pairs):
    es = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    adj: dict[int, set[int]] = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    verts = sorted(adj)
    n = 0
    # each 4-cycle u-a-v-b is hit once per DIAGONAL {u,v} (enumerated from
    # its smaller endpoint, v > u), i.e. exactly twice -> halve at the end
    for u in verts:
        for a in adj[u]:
            for b in adj[u]:
                if a >= b or a == u or b == u:
                    continue
                for v in adj[a] & adj[b]:
                    if v != u and v > u:
                        n += 1
    assert n % 2 == 0
    return n // 2


def test_square_count_closed_forms(spark):
    from split_merge_partitioner_spark.graph import square_count

    c4 = _df(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert square_count(c4).collect()[0].n_squares == 1
    k4 = _df(spark, [(i, j) for i in range(4) for j in range(i + 1, 4)])
    assert square_count(k4).collect()[0].n_squares == 3
    tri = _df(spark, [(1, 2), (2, 3), (1, 3)])
    assert square_count(tri).collect()[0].n_squares == 0
    # C(4,2)*C(4,2) biclique K_{2,2} count inside K_{4,4}: C(4,2)^2 = 36
    k44 = _df(spark, [(i, 10 + j) for i in range(4) for j in range(4)])
    assert square_count(k44).collect()[0].n_squares == 36


def test_square_count_matches_bruteforce_on_powerlaw(spark):
    from split_merge_partitioner_spark.graph import square_count

    pdf = powerlaw_edges_pdf(n=80, m_per_node=5, seed=13)
    got = square_count(spark.createDataFrame(pdf)).collect()[0].n_squares
    assert got == _brute_squares(list(zip(pdf["src"], pdf["dst"])))


def test_square_count_center_cap_undercounts_monotonically(spark):
    from split_merge_partitioner_spark.graph import square_count

    e = spark.createDataFrame(powerlaw_edges_pdf(n=80, m_per_node=5, seed=13))
    full = square_count(e).collect()[0].n_squares
    capped = square_count(e, max_center_degree=8).collect()[0].n_squares
    assert 0 <= capped <= full
