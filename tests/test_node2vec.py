"""node2vec_walks (graph/walks.py): independent NumPy replay of the
documented second-order semantics (splitmix64 chain, integer bias weights
over return/common/explore classes, cumulative-weight pick), plus
degenerate-equality with random_walks when all weights are equal."""

from __future__ import annotations

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import node2vec_walks, random_walks
from split_merge_partitioner_spark.graph.hyperanf import splitmix64

MASK63 = (1 << 63) - 1


def _sm(x: int) -> int:
    return int(splitmix64(np.array([np.uint64(x & 0xFFFFFFFFFFFFFFFF)]))[0])


def _py_node2vec(es, L, W, seed, wr, wc, wx):
    adj: dict[int, list[int]] = {}
    eset = set()
    for a, b in es:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
        eset.add((a, b))
        eset.add((b, a))
    adj = {u: sorted(vs) for u, vs in adj.items()}
    rows = []
    for start in adj:
        for walk in range(W):
            h = _sm(_sm(start + seed) + walk)
            prev, cur = None, start
            rows.append((start, walk, 0, start))
            for step in range(1, L + 1):
                nbrs = adj[cur]
                if prev is None:
                    j = (h & MASK63) % len(nbrs)
                    nxt = nbrs[j]
                else:
                    ws = [
                        wr if n == prev else (wc if (prev, n) in eset else wx)
                        for n in nbrs
                    ]
                    draw = (h & MASK63) % sum(ws)
                    acc = 0
                    for n, w in zip(nbrs, ws):
                        acc += w
                        if draw < acc:
                            nxt = n
                            break
                h = _sm(h)
                prev, cur = cur, nxt
                rows.append((start, walk, step, cur))
    return sorted(rows)


def _rand_edges(seed, n=40, m=90):
    es, x = set(), seed
    while len(es) < m:
        x = (x * 48271 + 7) % 2147483647
        a = x % n
        x = (x * 48271 + 7) % 2147483647
        b = x % n
        if a != b:
            es.add((min(a, b), max(a, b)))
    return sorted(es)


@pytest.mark.parametrize("bias", [(1, 2, 4), (3, 1, 1)])
def test_node2vec_matches_numpy_replay(spark, bias):
    wr, wc, wx = bias
    es = _rand_edges(13)
    edges = spark.createDataFrame(es, "src long, dst long")
    got = sorted(
        map(
            tuple,
            node2vec_walks(
                edges, walk_length=5, walks_per_vertex=2,
                w_return=wr, w_common=wc, w_explore=wx,
            ).collect(),
        )
    )
    assert got == _py_node2vec(es, 5, 2, 42, wr, wc, wx)


def test_node2vec_unit_bias_degenerates_to_uniform(spark):
    """All-equal weights make the cumulative pick the ascending-index pick,
    i.e. random_walks' trajectory — the documented degeneracy."""
    es = _rand_edges(29)
    edges = spark.createDataFrame(es, "src long, dst long")
    a = sorted(map(tuple, node2vec_walks(edges, 4, 1).collect()))
    b = sorted(map(tuple, random_walks(edges, walk_length=4, walks_per_vertex=1).collect()))
    assert a == b


def test_node2vec_validates_weights(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        node2vec_walks(edges, w_return=0)


def test_node2vec_releases_storage(spark):
    from tests.test_storage_release import RESULT_BUDGET, _new_after, _path_edges

    edges = _path_edges(spark)
    new, leaked = _new_after(
        spark, lambda: node2vec_walks(edges, walk_length=3, w_common=2)
    )
    assert new >= 1
    assert leaked <= RESULT_BUDGET
