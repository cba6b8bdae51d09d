"""random_walks: deterministic uniform-walk corpus (graph/walks.py).

The NumPy replay below is an independent reimplementation of the documented
semantics (sorted-neighbor indexing + splitmix64 hash chain) — the Spark
result must match it row-for-row, which is the same bar the DuckDB oracle
holds the driver query to."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.graph import random_walks
from split_merge_partitioner_spark.graph.hyperanf import splitmix64


def _sm64_scalar(x: int) -> int:
    return int(splitmix64(np.array([np.uint64(x & 0xFFFFFFFFFFFFFFFF)]))[0])


def _numpy_walks(pdf: pd.DataFrame, L: int, w: int, seed: int) -> pd.DataFrame:
    adj: dict[int, list[int]] = {}
    for u, v in zip(pdf.src.tolist(), pdf.dst.tolist()):
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    adj = {k: sorted(vs) for k, vs in adj.items()}
    rows = []
    for start in adj:
        for walk in range(w):
            h = _sm64_scalar(_sm64_scalar(start + seed) + walk)
            cur = start
            rows.append((start, walk, 0, cur))
            for t in range(1, L + 1):
                nbrs = adj[cur]
                cur = nbrs[(h & ((1 << 63) - 1)) % len(nbrs)]
                rows.append((start, walk, t, cur))
                h = _sm64_scalar(h)
    return pd.DataFrame(rows, columns=["start", "walk", "step", "vertex"])


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(7)
    src = rng.integers(0, 60, 300)
    dst = rng.integers(0, 60, 300)
    pdf = pd.DataFrame({"src": np.minimum(src, dst), "dst": np.maximum(src, dst)})
    return pdf[pdf.src != pdf.dst].drop_duplicates().reset_index(drop=True)


def test_walks_match_numpy_replay(spark, small_graph):
    L, w, seed = 6, 3, 11
    got = (
        random_walks(spark.createDataFrame(small_graph), walk_length=L,
                     walks_per_vertex=w, seed=seed)
        .toPandas()
        .sort_values(["start", "walk", "step"])
        .reset_index(drop=True)
    )
    want = (
        _numpy_walks(small_graph, L, w, seed)
        .sort_values(["start", "walk", "step"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got.astype("int64"), want.astype("int64"))


def test_walks_are_paths_and_deterministic(spark, small_graph):
    e = spark.createDataFrame(small_graph)
    a = random_walks(e, walk_length=5, walks_per_vertex=2, seed=1).toPandas()
    b = random_walks(e, walk_length=5, walks_per_vertex=2, seed=1).toPandas()
    key = ["start", "walk", "step"]
    pd.testing.assert_frame_equal(
        a.sort_values(key).reset_index(drop=True),
        b.sort_values(key).reset_index(drop=True),
    )
    # every consecutive (v_t, v_{t+1}) is an edge of the graph
    edge_set = set(map(tuple, small_graph[["src", "dst"]].to_numpy()))
    s = a.sort_values(key)
    prev = s.groupby(["start", "walk"])["vertex"].shift()
    hops = s[s.step > 0].assign(prev=prev[s.step > 0])
    for p, v in zip(hops.prev.astype(int), hops.vertex.astype(int)):
        assert (min(p, v), max(p, v)) in edge_set
    # a different seed produces a different corpus
    c = random_walks(e, walk_length=5, walks_per_vertex=2, seed=2).toPandas()
    assert not a.sort_values(key).reset_index(drop=True).equals(
        c.sort_values(key).reset_index(drop=True)
    )


def test_walks_shape_and_canonicalization(spark, small_graph):
    """Row count is exactly n*w*(L+1); dirty (reversed/dup/self-loop) input
    gives the identical corpus via the canonicalize pass."""
    L, w = 4, 2
    n = len(set(small_graph.src) | set(small_graph.dst))
    clean = random_walks(
        spark.createDataFrame(small_graph), walk_length=L, walks_per_vertex=w
    ).toPandas()
    assert len(clean) == n * w * (L + 1)
    dirty = pd.concat(
        [
            small_graph.rename(columns={"src": "dst", "dst": "src"}),
            small_graph.head(20),
            pd.DataFrame({"src": [3], "dst": [3]}),
        ],
        ignore_index=True,
    )
    got = random_walks(
        spark.createDataFrame(dirty), walk_length=L, walks_per_vertex=w
    ).toPandas()
    key = ["start", "walk", "step"]
    pd.testing.assert_frame_equal(
        clean.sort_values(key).reset_index(drop=True),
        got.sort_values(key).reset_index(drop=True),
    )


def test_walks_restore_session_confs(spark, small_graph):
    """The ANSI/AQE flips are loop-local (the pagerank try/finally rule)."""
    ansi = spark.conf.get("spark.sql.ansi.enabled")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    random_walks(spark.createDataFrame(small_graph), walk_length=2,
                 walks_per_vertex=1).count()
    assert spark.conf.get("spark.sql.ansi.enabled") == ansi
    assert spark.conf.get("spark.sql.adaptive.enabled") == aqe
