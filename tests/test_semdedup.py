"""SemDeDup within-cluster semantic dedup on planted near-duplicates."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.functions.dedup import semdedup_keep, semdedup_pairs


@pytest.fixture(scope="module")
def planted(spark):
    # ids 0,1 are the k=2 seed centroids (k smallest ids).  2 and 4 are
    # near-duplicates of 0; 3 is 0 negated (cos=-1: exercises the dot>0
    # guard); 5 is a near-duplicate of 1 (cos = 0.9/√0.82 ≈ 0.994) in
    # cluster 1.
    vecs = {
        0: [1.0, 0.0, 0.0, 0.0],
        1: [0.0, 1.0, 0.0, 0.0],
        2: [0.99, 0.01, 0.0, 0.0],
        3: [-1.0, 0.0, 0.0, 0.0],
        4: [0.98, 0.02, 0.0, 0.0],
        5: [0.0, 0.9, 0.1, 0.0],
    }
    pdf = pd.DataFrame(
        {"vec_id": list(vecs), "embedding": [np.array(v, dtype=np.float32) for v in vecs.values()]}
    )
    return spark.createDataFrame(pdf)


def test_pairs_found_within_cluster(spark, planted):
    got = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(planted, k=2, threshold_ppm=950_000).collect()
    }
    assert got == {(0, 2), (0, 4), (2, 4), (1, 5)}


def test_negated_vector_never_pairs(spark, planted):
    # cos(0, 3) = -1: |dot| passes any squared test — the dot>0 guard must
    # reject it even at a tiny threshold
    got = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(planted, k=2, threshold_ppm=10_000).collect()
    }
    assert (0, 3) not in got and (3, 4) not in got


def test_keep_first_rule(spark, planted):
    keep = {r.vec_id: r.keep for r in semdedup_keep(planted, k=2, threshold_ppm=950_000).collect()}
    assert keep == {0: True, 1: True, 2: False, 3: True, 4: False, 5: False}


def test_matches_numpy_within_cluster_replay(spark):
    """Full parity with a NumPy replay of the quantized predicate on a
    deterministic random batch (including the kmeans seed-centroid assign)."""
    rng = np.random.default_rng(7)
    V = rng.normal(size=(60, 8)).astype(np.float32)
    pdf = pd.DataFrame({"vec_id": range(60), "embedding": list(V)})
    k, t = 4, 600_000
    got = {
        (r.id_a, r.id_b)
        for r in semdedup_pairs(spark.createDataFrame(pdf), k=k, threshold_ppm=t).collect()
    }
    q = np.round(V.astype(np.float64) * 1000).astype(np.int64)
    cents = q[:k]
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    cid = d.argmin(axis=1)  # ties go to smallest cid: argmin picks first
    want = set()
    for a in range(60):
        for b in range(a + 1, 60):
            if cid[a] != cid[b]:
                continue
            dot = int(q[a] @ q[b])
            na2, nb2 = int(q[a] @ q[a]), int(q[b] @ q[b])
            if dot > 0 and dot * dot * 10**12 >= t * t * na2 * nb2:
                want.add((a, b))
    assert got == want and len(want) > 0
