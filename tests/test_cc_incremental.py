"""Incremental CC: merging a delta batch into precomputed labels must equal
a full recompute exactly (component = min reachable vertex id), including
brand-new vertices, chained batches, and the no-merge fast path."""

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import (
    connected_components_incremental,
    connected_components_stars,
)


def _union_find_components(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in pairs:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    return {v: find(v) for v in parent}


def _labels(df):
    return {(r.vertex, r.component) for r in df.collect()}


def _random_edges(seed, n=120, m=200):
    rng = np.random.default_rng(seed)
    return sorted({
        (int(a), int(b))
        for a, b in rng.integers(0, n, size=(m, 2))
        if a != b
    })


@pytest.mark.parametrize("seed,cut", [(1, 0.9), (2, 0.5), (3, 0.98)])
def test_incremental_equals_full_recompute(spark, seed, cut):
    pairs = _random_edges(seed)
    k = int(len(pairs) * cut)
    base, delta = pairs[:k], pairs[k:]
    base_df = spark.createDataFrame(base, "src long, dst long")
    delta_df = spark.createDataFrame(delta, "src long, dst long")
    base_lab, _ = connected_components_stars(base_df)
    got, info = connected_components_incremental(base_lab, delta_df)
    expected = {(v, c) for v, c in _union_find_components(pairs).items()}
    assert _labels(got) == expected, info
    assert info["converged"]


def test_incremental_brand_new_vertices_and_bridge(spark):
    # base: two components {0,1,2} and {10,11}; delta adds new vertices 50,51
    # and a bridge 2-10 merging the two base components
    base = [(0, 1), (1, 2), (10, 11)]
    delta = [(50, 51), (2, 10), (51, 0)]
    base_lab, _ = connected_components_stars(
        spark.createDataFrame(base, "src long, dst long")
    )
    got, info = connected_components_incremental(
        base_lab, spark.createDataFrame(delta, "src long, dst long")
    )
    expected = {(v, c) for v, c in _union_find_components(base + delta).items()}
    assert _labels(got) == expected
    assert info["merged_links"] >= 2


def test_incremental_no_merge_fast_path(spark):
    # delta edges entirely inside existing components: zero CC rounds
    base = [(0, 1), (1, 2), (10, 11)]
    base_lab, _ = connected_components_stars(
        spark.createDataFrame(base, "src long, dst long")
    )
    got, info = connected_components_incremental(
        base_lab, spark.createDataFrame([(0, 2), (11, 10)], "src long, dst long")
    )
    assert info == {"rounds": 0, "merged_links": 0, "converged": True}
    assert _labels(got) == _labels(base_lab)


def test_incremental_chained_batches_closed(spark):
    # output feeds back in as the next batch's label table
    pairs = _random_edges(9, n=80, m=120)
    thirds = [pairs[:40], pairs[40:80], pairs[80:]]
    lab, _ = connected_components_stars(
        spark.createDataFrame(thirds[0], "src long, dst long")
    )
    for batch in thirds[1:]:
        lab, _ = connected_components_incremental(
            lab, spark.createDataFrame(batch, "src long, dst long")
        )
    expected = {(v, c) for v, c in _union_find_components(pairs).items()}
    assert _labels(lab) == expected
