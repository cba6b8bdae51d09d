"""walk_topk_recs (graph/walks.py) vs a driver-side aggregation of the same
corpus plus the ranking laws (tie-break, k cap, self-exclusion)."""

from __future__ import annotations

from collections import Counter

import pytest

from split_merge_partitioner_spark.graph import random_walks, walk_topk_recs


def test_matches_corpus_aggregation(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    df = spark.createDataFrame(powerlaw_edges_pdf(n=50, m_per_node=3, seed=8))
    L, W, K = 5, 3, 4
    corpus = random_walks(df, walk_length=L, walks_per_vertex=W, seed=2).collect()
    counts: dict[int, Counter] = {}
    for r in corpus:
        if r.step >= 1 and r.vertex != r.start:
            counts.setdefault(r.start, Counter())[r.vertex] += 1
    want = {}
    for s, c in counts.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
        for i, (rec, n) in enumerate(ranked, 1):
            want[(s, rec)] = (n, i)
    got = {
        (r.start, r.rec): (r.n_visits, r.rnk)
        for r in walk_topk_recs(
            df, k=K, walk_length=L, walks_per_vertex=W, seed=2
        ).collect()
    }
    assert got == want


def test_k_cap_and_self_exclusion(spark):
    df = spark.createDataFrame(
        [(0, i) for i in range(1, 6)] + [(i, i + 10) for i in range(1, 6)],
        "src long, dst long",
    )
    out = walk_topk_recs(df, k=2, walk_length=4, walks_per_vertex=4, seed=1).collect()
    per_start = Counter(r.start for r in out)
    assert max(per_start.values()) <= 2
    assert all(r.rec != r.start for r in out)
    assert all(r.rnk in (1, 2) for r in out)


def test_validations(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        walk_topk_recs(df, k=0)
