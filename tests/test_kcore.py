"""Coreness (graph/kcore.py): exact vs peeling oracle, path agreement,
fixed-iteration mode, structural sanity."""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd

from split_merge_partitioner_spark.graph.kcore import coreness


def _exact_coreness(pairs):
    """Textbook sequential peel — the oracle."""
    verts = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj = [[] for _ in range(n)]
    for a, b in pairs:
        adj[idx[a]].append(idx[b])
        adj[idx[b]].append(idx[a])
    cur = np.array([len(a) for a in adj])
    alive = np.ones(n, bool)
    heap = [(int(cur[i]), i) for i in range(n)]
    heapq.heapify(heap)
    k = 0
    res = np.zeros(n, int)
    while heap:
        dv, v = heapq.heappop(heap)
        if not alive[v] or dv != cur[v]:
            continue
        k = max(k, dv)
        res[v] = k
        alive[v] = False
        for u in adj[v]:
            if alive[u]:
                cur[u] -= 1
                heapq.heappush(heap, (int(cur[u]), u))
    return {v: int(res[idx[v]]) for v in verts}


def _df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame({"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]})
    )


def _random_pairs(seed, n_v=80, n_draw=400):
    rng = np.random.default_rng(seed)
    raw = {(int(a), int(b)) for a, b in rng.integers(0, n_v, size=(n_draw, 2)) if a != b}
    return list({(min(a, b), max(a, b)) for a, b in raw})


def test_coreness_matches_peeling_oracle(spark):
    pairs = _random_pairs(3)
    e = _df(spark, pairs).persist()
    out, info = coreness(e)
    got = dict(out.toPandas().itertuples(index=False))
    assert info["converged"] and info["mode"] == "dense"
    assert got == _exact_coreness(pairs)


def test_paths_agree_exact(spark):
    pairs = _random_pairs(11)
    e = _df(spark, pairs).persist()
    pd_d = coreness(e)[0].toPandas().sort_values("vertex").reset_index(drop=True)
    pd_s = (
        coreness(e, dense_threshold=0)[0]  # force the shuffle/window path
        .toPandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(pd_d, pd_s, check_dtype=False)


def test_clique_and_tree_structure(spark):
    k = 7
    clique = [(i, j) for i in range(k) for j in range(i + 1, k)]
    tree = [(100, 101), (100, 102), (101, 103), (101, 104), (102, 105)]
    e = _df(spark, clique + tree).persist()
    got = dict(coreness(e)[0].toPandas().itertuples(index=False))
    assert all(got[i] == k - 1 for i in range(k))  # clique: coreness k-1
    assert all(got[v] == 1 for v in range(100, 106))  # tree: coreness 1


def test_fixed_iteration_mode(spark):
    pairs = _random_pairs(5)
    e = _df(spark, pairs).persist()
    exact = _exact_coreness(pairs)
    # enough sweeps -> equals exact coreness (fixpoint is stable), both paths
    for kwargs in ({}, {"dense_threshold": 0}):
        out, info = coreness(e, n_iter=12, **kwargs)
        assert info["iterations"] == 12
        got = dict(out.toPandas().itertuples(index=False))
        assert got == exact


def test_empty(spark):
    e = spark.createDataFrame([], schema="src long, dst long")
    out, info = coreness(e)
    assert out.count() == 0 and info["converged"]


def test_coreness_incremental_matches_cold(spark):
    from split_merge_partitioner_spark.graph.kcore import coreness_incremental

    pairs = _random_pairs(7)
    # deterministic split: ~1/5 of edges arrive as the delta batch
    base = [(a, b) for a, b in pairs if (a * 1000003 + b) % 5 != 0]
    delta = [(a, b) for a, b in pairs if (a * 1000003 + b) % 5 == 0]
    bdf = spark.createDataFrame(base, "src long, dst long")
    ddf = spark.createDataFrame(delta, "src long, dst long")
    mdf = spark.createDataFrame(pairs, "src long, dst long")
    base_core, _ = coreness(bdf)
    cold, cold_info = coreness(mdf)
    warm, warm_info = coreness_incremental(bdf, ddf, base_core)
    assert warm_info["converged"] and warm_info["k_new"] == len(delta)
    got = {r.vertex: r.coreness for r in warm.collect()}
    exp = {r.vertex: r.coreness for r in cold.collect()}
    assert got == exp
    # shuffle path agrees too
    warm_s, info_s = coreness_incremental(bdf, ddf, base_core, dense_threshold=0)
    assert info_s["mode"] == "shuffle" and info_s["converged"]
    assert {r.vertex: r.coreness for r in warm_s.collect()} == exp


def test_coreness_incremental_localized_delta_converges_fast(spark):
    from split_merge_partitioner_spark.graph.kcore import coreness_incremental

    # long path (core 1; cold h-index convergence is O(n/2) sweeps: the
    # degree->1 repair walks inward from the ends) + a 6-clique (core 5);
    # the delta adds one edge at the clique (K_e = 5), so the level-window
    # init inflates only levels 4..6 and the path stays at its fixpoint
    path = [(i, i + 1) for i in range(60)]
    clique = [(100 + i, 100 + j) for i in range(6) for j in range(i + 1, 6)]
    base = path + clique + [(60, 100)]
    delta = [(100, 200), (101, 200), (102, 200), (103, 200), (104, 200)]
    bdf = spark.createDataFrame(base, "src long, dst long")
    ddf = spark.createDataFrame(delta, "src long, dst long")
    base_core, base_info = coreness(bdf)
    warm, warm_info = coreness_incremental(bdf, ddf, base_core)
    cold, cold_info = coreness(
        spark.createDataFrame(base + delta, "src long, dst long")
    )
    assert {r.vertex: r.coreness for r in warm.collect()} == {
        r.vertex: r.coreness for r in cold.collect()
    }
    # cold pays the path repair; warm starts at the base fixpoint outside
    # the clique levels and settles in a few sweeps
    assert cold_info["iterations"] > 20
    assert warm_info["iterations"] <= 5, warm_info
    # duplicate-only delta: k_new = 0, init == old == fixpoint, 1 sweep
    dup, dup_info = coreness_incremental(
        bdf, spark.createDataFrame(base[:3], "src long, dst long"), base_core
    )
    assert dup_info["k_new"] == 0 and dup_info["iterations"] == 1
    assert {r.vertex: r.coreness for r in dup.collect()} == {
        r.vertex: r.coreness for r in base_core.collect()
    }


def test_coreness_incremental_new_vertices_and_dup_edges(spark):
    from split_merge_partitioner_spark.graph.kcore import coreness_incremental

    base = [(0, 1), (1, 2), (0, 2)]
    # delta: duplicate of a base edge + a brand-new pendant chain 10-11-12
    delta = [(0, 1), (10, 11), (11, 12)]
    bdf = spark.createDataFrame(base, "src long, dst long")
    ddf = spark.createDataFrame(delta, "src long, dst long")
    base_core, _ = coreness(bdf)
    warm, info = coreness_incremental(bdf, ddf, base_core)
    assert info["k_new"] == 2  # the duplicate does not count
    got = {r.vertex: r.coreness for r in warm.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 10: 1, 11: 1, 12: 1}


def test_coreness_incremental_shuffle_sequential_and_noop(spark):
    from split_merge_partitioner_spark.graph.kcore import coreness_incremental

    path = [(i, i + 1) for i in range(20)]
    clique = [(100 + i, 100 + j) for i in range(5) for j in range(i + 1, 5)]
    base = path + clique + [(20, 100)]
    delta = [(100, 200), (101, 200), (102, 200)]  # k=3 -> sequential regime
    bdf = spark.createDataFrame(base, "src long, dst long")
    ddf = spark.createDataFrame(delta, "src long, dst long")
    base_core, _ = coreness(bdf)
    warm, info = coreness_incremental(bdf, ddf, base_core, dense_threshold=0)
    assert info["mode"] == "shuffle" and info["converged"]
    cold, _ = coreness(spark.createDataFrame(base + delta, "src long, dst long"))
    assert {r.vertex: r.coreness for r in warm.collect()} == {
        r.vertex: r.coreness for r in cold.collect()
    }
    # duplicate-only delta on the shuffle path: one verification sweep
    dup, dinfo = coreness_incremental(
        bdf, spark.createDataFrame(base[:2], "src long, dst long"),
        base_core, dense_threshold=0,
    )
    assert dinfo["k_new"] == 0 and dinfo["iterations"] == 1
    assert {r.vertex: r.coreness for r in dup.collect()} == {
        r.vertex: r.coreness for r in base_core.collect()
    }


def test_coreness_incremental_cli(spark, tmp_path):
    from jobs.run_analytics import main as analytics_main

    base = [(0, 1), (1, 2), (0, 2), (2, 3)]
    bdf = spark.createDataFrame(base, "src long, dst long")
    bpath = str(tmp_path / "base.parquet")
    bdf.write.parquet(bpath)
    core0, _ = coreness(bdf)
    cpath = str(tmp_path / "core.parquet")
    core0.write.parquet(cpath)
    dpath = str(tmp_path / "delta.parquet")
    spark.createDataFrame([(0, 3), (1, 3)], "src long, dst long").write.parquet(dpath)
    out = str(tmp_path / "warm.parquet")
    analytics_main(["--input", bpath, "--algo", "kcore", "--delta-input", dpath,
                    "--coreness-input", cpath, "--output", out], stop=False)
    import pandas as pd_

    got = pd_.read_parquet(out).set_index("vertex")["coreness"].to_dict()
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}  # K4 after the delta
