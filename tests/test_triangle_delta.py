"""triangle_delta vs brute-force classification of merged triangles by
new-edge count; consistency with full recounts; corner cases."""

from __future__ import annotations

from itertools import combinations

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import triangle_count, triangle_delta


def _canon(pairs):
    return sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})


def _brute(base, delta):
    base = set(_canon(base))
    d = set(_canon(delta)) - base
    merged = base | d
    adj: dict[int, set] = {}
    for a, b in merged:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    t = {1: 0, 2: 0, 3: 0}
    verts = sorted(adj)
    for a, b, c in combinations(verts, 3):
        tri = [(a, b), (a, c), (b, c)]
        if all(e in merged for e in tri):
            k = sum(e in d for e in tri)
            if k:
                t[k] += 1
    return len(d), t[1], t[2], t[3], t[1] + t[2] + t[3]


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_triangle_delta_matches_bruteforce(spark):
    rng = np.random.default_rng(7)
    base = [(int(a), int(b)) for a, b in rng.integers(0, 25, size=(80, 2))]
    delta = [(int(a), int(b)) for a, b in rng.integers(0, 25, size=(25, 2))]
    got = tuple(triangle_delta(_df(spark, base), _df(spark, delta)).collect()[0])
    assert got == _brute(base, delta)


def test_triangle_delta_consistent_with_full_recount(spark):
    rng = np.random.default_rng(3)
    base = [(int(a), int(b)) for a, b in rng.integers(0, 30, size=(120, 2))]
    delta = [(int(a), int(b)) for a, b in rng.integers(0, 30, size=(30, 2))]
    base_df, delta_df = _df(spark, base), _df(spark, delta)
    merged_df = _df(spark, sorted(set(_canon(base)) | set(_canon(delta))))
    row = triangle_delta(base_df, delta_df).collect()[0]
    assert triangle_count(_df(spark, _canon(base)), orient="id") + \
        row.delta_triangles == triangle_count(merged_df, orient="id")


def test_triangle_delta_classification_corners(spark):
    # base path 0-1-2; delta closes it: one triangle with exactly 1 new edge
    row = triangle_delta(_df(spark, [(0, 1), (1, 2)]), _df(spark, [(0, 2)])).collect()[0]
    assert tuple(row) == (1, 1, 0, 0, 1)
    # base single edge; delta adds the two others: one triangle, 2 new edges
    row = triangle_delta(_df(spark, [(0, 1)]), _df(spark, [(1, 2), (0, 2)])).collect()[0]
    assert tuple(row) == (2, 0, 1, 0, 1)
    # empty base; delta is a full triangle: 3 new edges
    empty = _df(spark, []).sparkSession.createDataFrame([], "src long, dst long")
    row = triangle_delta(empty, _df(spark, [(0, 1), (1, 2), (0, 2)])).collect()[0]
    assert tuple(row) == (3, 0, 0, 1, 1)


def test_triangle_delta_ignores_duplicates_and_existing(spark):
    # delta re-sends existing edges (any orientation) + self-loops: no-op
    base = [(0, 1), (1, 2), (0, 2)]
    row = triangle_delta(
        _df(spark, base), _df(spark, [(1, 0), (2, 1), (3, 3)])
    ).collect()[0]
    assert tuple(row) == (0, 0, 0, 0, 0)


def test_triangle_delta_no_net_storage_growth(spark):
    sc = spark.sparkContext
    base_df = _df(spark, [(v, (v + 1) % 15) for v in range(15)])
    delta_df = _df(spark, [(0, 7), (3, 9)])
    before = len(sc._jsc.sc().getRDDStorageInfo())
    triangle_delta(base_df, delta_df).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 0  # result is a local row, nothing retained
