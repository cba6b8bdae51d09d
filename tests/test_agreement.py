"""Pair-counting Rand index tests: hand-computed contingencies, identity /
independence edge cases, label-renaming invariance, and a brute-force
O(n^2) pair check on a random labeling."""

from __future__ import annotations

import random
from itertools import combinations

from split_merge_partitioner_spark.graph.agreement import partition_agreement


def _df(spark, labels):
    return spark.createDataFrame(
        [(v, l) for v, l in labels.items()], "vertex long, label long"
    )


def _brute_rand_ppm(la, lb):
    verts = sorted(set(la) & set(lb))
    agree = 0
    pairs = list(combinations(verts, 2))
    for u, v in pairs:
        same_a = la[u] == la[v]
        same_b = lb[u] == lb[v]
        agree += same_a == same_b
    return (1_000_000 * agree) // len(pairs) if pairs else 1_000_000


def test_identical_partitions_full_agreement(spark):
    la = {v: v % 3 for v in range(12)}
    row = partition_agreement(_df(spark, la), _df(spark, la)).collect()[0]
    assert row.rand_index_ppm == 1_000_000
    assert row.n_vertices == 12 and row.n_pairs == 66
    assert row.sum_ij_c2 == row.sum_a_c2 == row.sum_b_c2


def test_hand_contingency(spark):
    # A = {0,1,2 | 3,4,5}; B = {0,1 | 2,3 | 4,5}: n_ij = [[2,1,0],[0,1,2]]
    la = {v: v // 3 for v in range(6)}
    lb = {v: v // 2 for v in range(6)}
    row = partition_agreement(_df(spark, la), _df(spark, lb)).collect()[0]
    assert row.sum_ij_c2 == 2  # C(2,2)+C(2,2)
    assert row.sum_a_c2 == 6  # 2*C(3,2)
    assert row.sum_b_c2 == 3  # 3*C(2,2)
    assert row.n_pairs == 15
    # agree = 2 + (15 - 6 - 3 + 2) = 10
    assert row.rand_index_ppm == (1_000_000 * 10) // 15
    assert row.rand_index_ppm == _brute_rand_ppm(la, lb)


def test_label_renaming_invariance_and_join_semantics(spark):
    la = {v: v % 4 for v in range(20)}
    lb = {v: (v * 7) % 5 for v in range(20)}
    r1 = partition_agreement(_df(spark, la), _df(spark, lb)).collect()[0]
    ren = {v: 100 - l for v, l in la.items()}
    r2 = partition_agreement(_df(spark, ren), _df(spark, lb)).collect()[0]
    assert r1.rand_index_ppm == r2.rand_index_ppm
    assert r1.sum_ij_c2 == r2.sum_ij_c2
    # inner-join semantics: extra vertices on one side are excluded
    lb_extra = dict(lb)
    lb_extra[999] = 0
    r3 = partition_agreement(_df(spark, la), _df(spark, lb_extra)).collect()[0]
    assert r3.n_vertices == 20 and r3.rand_index_ppm == r1.rand_index_ppm


def test_random_labelings_match_bruteforce(spark):
    rng = random.Random(3)
    la = {v: rng.randrange(5) for v in range(40)}
    lb = {v: rng.randrange(3) for v in range(40)}
    row = partition_agreement(_df(spark, la), _df(spark, lb)).collect()[0]
    assert row.rand_index_ppm == _brute_rand_ppm(la, lb)
