"""salsa_scores (graph/salsa.py): closed form vs hand values and vs a
NumPy power iteration of the ACTUAL SALSA authority chain."""

from __future__ import annotations

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import salsa_scores

PPB = 1_000_000_000


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_two_components_hand_values(spark):
    # c1: hubs {1,2} -> auths {101,102}, m=3; c2: 3 -> 103, m=1
    e = _df(spark, [(1, 101), (1, 102), (2, 101), (3, 103)])
    out = {r.vertex: (r.deg, r.component, r.salsa_ppb)
           for r in salsa_scores(e, side="auth").collect()}
    assert out == {
        101: (2, 1, (2 * 2 * PPB) // (3 * 3)),
        102: (1, 1, (1 * 2 * PPB) // (3 * 3)),
        103: (1, 3, (1 * 1 * PPB) // (1 * 3)),
    }
    hub = {r.vertex: r.salsa_ppb for r in salsa_scores(e, side="hub").collect()}
    assert hub == {
        1: (2 * 2 * PPB) // (3 * 3),
        2: (1 * 2 * PPB) // (3 * 3),
        3: (1 * 1 * PPB) // (1 * 3),
    }


def test_complete_bipartite_uniform(spark):
    # K_{3,4}: every authority scores exactly 1e9 / 4
    e = _df(spark, [(h, 100 + a) for h in range(3) for a in range(4)])
    out = salsa_scores(e, side="auth").collect()
    assert len(out) == 4
    assert all(r.salsa_ppb == PPB // 4 for r in out)


def test_closed_form_matches_chain_stationary(spark):
    # random bipartite graph, several components; power-iterate the real
    # SALSA authority chain (back along an in-link, forward along an
    # out-link) and compare per-component stationary mass to the closed form
    rng = np.random.default_rng(5)
    pairs = {(int(h), int(100 + a)) for h, a in
             zip(rng.integers(0, 14, 60), rng.integers(0, 14, 60))}
    pairs = sorted(pairs)
    auths = sorted({d for _, d in pairs})
    hubs = sorted({s for s, _ in pairs})
    ai = {v: i for i, v in enumerate(auths)}
    din = {v: sum(1 for _, d in pairs if d == v) for v in auths}
    dout = {h: sum(1 for s, _ in pairs if s == h) for h in hubs}
    # authority-chain transition matrix P[v, w]
    P = np.zeros((len(auths), len(auths)))
    for (h, v) in pairs:
        for (h2, w) in pairs:
            if h2 == h:
                P[ai[v], ai[w]] += (1.0 / din[v]) * (1.0 / dout[h])
    # per-component stationary via long power iteration from uniform-within-
    # component start (the chain may be periodic; average two steps)
    out = {r.vertex: r for r in salsa_scores(_df(spark, pairs), side="auth").collect()}
    comps: dict[int, list[int]] = {}
    for v in auths:
        comps.setdefault(out[v].component, []).append(v)
    n_side = len(auths)
    for cverts in comps.values():
        idx = [ai[v] for v in cverts]
        x = np.zeros(len(auths))
        x[idx] = 1.0 / len(idx)
        for _ in range(500):
            x = 0.5 * (x @ P) + 0.5 * x  # lazy chain: kills periodicity
        for v in cverts:
            expected_ppb = x[ai[v]] * len(cverts) / n_side * PPB
            assert abs(out[v].salsa_ppb - expected_ppb) <= 2, (v, out[v])


def test_rejects_bad_side(spark):
    with pytest.raises(ValueError):
        salsa_scores(_df(spark, [(1, 2)]), side="both")


# ---------------------------------------------------------------------------
# quantize_embeddings (functions/similarity.py) — kept here to avoid another
# session-startup file; tests are independent of SALSA
# ---------------------------------------------------------------------------

def test_quantize_hand_values(spark):
    from split_merge_partitioner_spark.functions.similarity import quantize_embeddings

    emb = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    out = {r.vec_id: (r.scale, r.qvec) for r in quantize_embeddings(emb).collect()}
    assert out[1] == (1.0, [127, -63, 32])   # floor(-63.5+0.5) = -63; floor(32.25) = 32
    assert out[2] == (0.0, [0, 0, 0])


def test_quantize_bounds_and_reconstruction(spark):
    import numpy as np
    from split_merge_partitioner_spark.functions.similarity import quantize_embeddings

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(50, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    for r in quantize_embeddings(emb, bits=8).collect():
        q = np.array(r.qvec, dtype=np.int64)
        assert q.min() >= -127 and q.max() <= 127
        x = vecs[r.vec_id].astype(np.float64)
        # symmetric quantization reconstruction error <= half a step
        recon = q * (r.scale / 127.0)
        assert np.max(np.abs(recon - x)) <= r.scale / 254.0 * (1 + 1e-9)


def test_quantize_rejects_bad_bits(spark):
    from split_merge_partitioner_spark.functions.similarity import quantize_embeddings

    emb = spark.createDataFrame([(1, [1.0])], "vec_id long, embedding array<float>")
    with pytest.raises(ValueError):
        quantize_embeddings(emb, bits=1)


def test_knn_quantized_hand_order(spark):
    from split_merge_partitioner_spark.functions.similarity import knn_quantized

    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),
            (2, [0.9, 0.1]),    # closest to 1
            (3, [0.0, 1.0]),    # orthogonal to 1
        ],
        "vec_id long, embedding array<float>",
    )
    out = {(r.query_id, r.rank): (r.neighbor_id, r.qdot)
           for r in knn_quantized(emb, k=2).collect()}
    # q=1: qvec (127, 0); 2 -> (127, 14): dot 16129 ; 3 -> (0, 127): dot 0
    assert out[(1, 1)] == (2, 127 * 127)
    assert out[(1, 2)] == (3, 0)


def test_knn_quantized_rerank_matches_allpairs_on_candidates(spark):
    import numpy as np
    from split_merge_partitioner_spark.functions.similarity import knn_quantized

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    cands = spark.createDataFrame(
        [(i, j) for i in range(30) for j in range(30) if i != j],
        "query_id long, neighbor_id long",
    )
    full = {(r.query_id, r.rank): r.neighbor_id
            for r in knn_quantized(emb, k=3).collect()}
    rer = {(r.query_id, r.rank): r.neighbor_id
           for r in knn_quantized(emb, k=3, candidates=cands).collect()}
    assert full == rer


def test_knn_quantized_mostly_agrees_with_float_top1(spark):
    import numpy as np
    from split_merge_partitioner_spark.functions.similarity import knn_quantized

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(60, 32)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    got = {r.query_id: r.neighbor_id
           for r in knn_quantized(emb, k=1).collect()}
    # float64 ground truth (UNnormalized dot, matching the quantized scoring
    # up to per-vector scale: scale>0 preserves each query's ranking only up
    # to the NEIGHBOR scale, so expect high-but-not-perfect agreement)
    X = vecs.astype(np.float64)
    S = X @ X.T
    np.fill_diagonal(S, -np.inf)
    truth = S.argmax(axis=1)
    agree = sum(got[i] == truth[i] for i in range(60))
    assert agree >= 42  # >= 70% top-1 agreement at int8 resolution


def test_component_size_histogram_hand(spark):
    from split_merge_partitioner_spark.graph import component_size_histogram

    # components: {1,2}, {3,4}, {5,6,7} -> sizes {2:2, 3:1}
    e = _df(spark, [(1, 2), (3, 4), (5, 6), (6, 7)])
    out = {r.size: r.n_components for r in component_size_histogram(e).collect()}
    assert out == {2: 2, 3: 1}


def test_degree_gini_hand_values(spark):
    from split_merge_partitioner_spark.graph import degree_gini

    # star K_{1,3}: degrees (1,1,1,3) -> G = 0.25 exactly
    star = _df(spark, [(0, 1), (0, 2), (0, 3)])
    r = degree_gini(star).collect()[0]
    assert (r.n_vertices, r.m2_sum_degrees, r.gini_ppm) == (4, 6, 250_000)
    # 4-cycle: regular -> G = 0
    c4 = _df(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    assert degree_gini(c4).collect()[0].gini_ppm == 0


def test_degree_gini_matches_rank_formula_on_powerlaw(spark):
    import numpy as np
    from split_merge_partitioner_spark.graph import degree_gini
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=200, m_per_node=4, seed=9)
    e = spark.createDataFrame(pdf)
    r = degree_gini(e).collect()[0]
    deg: dict[int, int] = {}
    for a, b in zip(pdf["src"], pdf["dst"]):
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    d = np.sort(np.array(list(deg.values()), dtype=np.int64))
    n, s = len(d), int(d.sum())
    num = 2 * int((np.arange(1, n + 1) * d).sum()) - (n + 1) * s
    assert r.gini_ppm == (num * 1_000_000) // (n * s)


def test_two_stage_ivf_retrieve_int8_rerank_recall(spark):
    """The documented 100-TB shape end to end: IVF retrieves a candidate
    pool, knn_quantized reranks it with exact int8 dots.  On unit-norm
    vectors (cosine == dot) the two-stage top-5 stays close to the float
    brute-force top-5."""
    import numpy as np
    from split_merge_partitioner_spark.functions.similarity import (
        brute_force_knn,
        ivf_knn,
        knn_quantized,
    )

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(200, 16))
    vecs = (vecs / np.linalg.norm(vecs, axis=1, keepdims=True)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    truth: dict[int, set] = {}
    for r in brute_force_knn(emb, k=5).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    pool = ivf_knn(emb, k=20, n_centroids=8, n_probes=5).select(
        "query_id", "neighbor_id"
    )
    got: dict[int, set] = {}
    for r in knn_quantized(emb, k=5, candidates=pool).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    hits = sum(len(got.get(q, set()) & t) for q, t in truth.items())
    total = sum(len(t) for t in truth.values())
    assert hits / total >= 0.8, hits / total


def test_rrf_fuse_hand_scores(spark):
    from split_merge_partitioner_spark.functions.similarity import rrf_fuse

    r1 = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)],
        "query_id long, neighbor_id long, rank long",
    )
    r2 = spark.createDataFrame(
        [(1, 11, 1), (1, 12, 2), (1, 13, 3)],
        "query_id long, neighbor_id long, rank long",
    )
    out = {r.neighbor_id: (r.rrf_score, r.rank)
           for r in rrf_fuse([r1, r2], k=4).collect()}
    s = lambda rk: 1_000_000_000 // (60 + rk)  # noqa: E731
    assert out == {
        11: (s(2) + s(1), 1),     # in both lists -> wins
        12: (s(3) + s(2), 2),
        10: (s(1), 3),            # s(1) > s(3): single first-place beats third
        13: (s(3), 4),
    }


def test_rrf_fuse_validation(spark):
    import pytest as _pytest

    from split_merge_partitioner_spark.functions.similarity import rrf_fuse

    with _pytest.raises(ValueError):
        rrf_fuse([])
    r = spark.createDataFrame([(1, 2, 1)], "query_id long, neighbor_id long, rank long")
    with _pytest.raises(ValueError):
        rrf_fuse([r], k=0)
