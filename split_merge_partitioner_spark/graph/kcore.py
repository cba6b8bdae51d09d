"""Coreness (k-core decomposition) via the iterated neighbor h-index
(Lu, Zhou, Zhang & Stanley, "The H-index of a network node and its relation
to degree and coreness", Nature Communications 2016): with c_0 = degree and
c_{t+1}(v) = H({c_t(u) : u ~ v}), the sequence is monotone non-increasing and
converges to coreness(v) EXACTLY — no approximation, unlike sketch operators.

Why h-index and not peeling: the textbook peel (repeatedly delete min-degree
vertices) is inherently sequential — a global priority queue over 10^12
vertices.  The h-operator is a local GAS-style update, so it distributes the
same way PageRank/CC do, converging in O(graph depth) supersteps.

Two executors (pattern of components.py / hyperanf.py):
- dense driver path (m <= ``dense_threshold`` edges): dense-id edge arrays are
  collected ONCE and the fixpoint runs vectorized on the driver (lexsort +
  segmented reduceat h-index) — zero supersteps of job overhead, the sandbox
  accelerator.
- shuffle path (the cluster-scale configuration): per superstep, neighbor
  values in both directions + ROW_NUMBER window ordered by value desc +
  max(least(rn, value)) — the h-index as three JVM operators, one shuffle per
  superstep, state localCheckpointed for lineage-free constant plans.

Determinism / oracle: h-index is invariant to tie order, every path yields the
identical integer sequence, and a fixed-iteration run is expressible as
chained SQL CTEs — the driver oracle (__spark_entry__ "coreness_hindex")
replays the same window formula in DuckDB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..storage import release


def _hindex_numpy(n: int, s: np.ndarray, d: np.ndarray, c: np.ndarray) -> np.ndarray:
    """One h-operator sweep, fully vectorized: for every vertex the h-index of
    its neighbors' values — sort (vertex, -value) pairs, rank within each
    vertex segment, then segmented max of min(rank, value)."""
    vtx = np.concatenate([s, d])
    val = np.concatenate([c[d], c[s]])
    order = np.lexsort((-val, vtx))
    vtx, val = vtx[order], val[order]
    starts = np.flatnonzero(np.r_[True, vtx[1:] != vtx[:-1]])
    rank = np.arange(len(vtx)) - np.repeat(starts, np.diff(np.r_[starts, len(vtx)])) + 1
    cand = np.minimum(rank, val)
    out = np.zeros(n, dtype=np.int64)
    seg_max = np.maximum.reduceat(cand, starts)
    out[vtx[starts]] = seg_max
    return out


def _coreness_dense(spark, edges: DataFrame, n_iter: int | None, max_iter: int):
    from ..sources.edges import vertices_of

    verts = np.sort(vertices_of(edges).toPandas()["vertex"].to_numpy(np.int64))
    e = edges.select("src", "dst").toPandas()
    s = np.searchsorted(verts, e["src"].to_numpy(np.int64))
    d = np.searchsorted(verts, e["dst"].to_numpy(np.int64))
    n = len(verts)
    c = np.zeros(n, dtype=np.int64)
    np.add.at(c, s, 1)
    np.add.at(c, d, 1)
    info = {"iterations": 0, "converged": False, "mode": "dense"}
    steps = n_iter if n_iter is not None else max_iter
    for _ in range(steps):
        new = _hindex_numpy(n, s, d, c)
        info["iterations"] += 1
        if (new == c).all():
            # fixed-iteration runs report convergence too (matching the
            # shuffle path); the remaining sweeps are no-ops either way
            info["converged"] = True
            c = new
            break
        c = new
    if n_iter is not None:
        info["iterations"] = n_iter  # fixed-shape contract: k sweeps ran (rest no-op)
    elif not info["converged"]:
        info["converged"] = bool((_hindex_numpy(n, s, d, c) == c).all())
    out = spark.createDataFrame(pd.DataFrame({"vertex": verts, "coreness": c}))
    return out, info


def _coreness_shuffle(spark, edges: DataFrame, n_iter: int | None, max_iter: int):
    from ..sources.edges import degrees

    und = (
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionAll(edges.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .localCheckpoint(eager=True)
    )
    state = (
        degrees(edges)
        .select("vertex", F.col("degree").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    w = Window.partitionBy("v").orderBy(F.desc("cu"), F.asc("b"))
    info = {"iterations": 0, "converged": False, "mode": "shuffle"}
    steps = n_iter if n_iter is not None else max_iter
    for _ in range(steps):
        vals = und.join(state.withColumnRenamed("vertex", "b"), "b").select(
            F.col("a").alias("v"), "b", F.col("c").alias("cu")
        )
        new_state = (
            vals.withColumn("rn", F.row_number().over(w))
            .groupBy("v")
            .agg(F.max(F.least("rn", "cu")).alias("c"))
            .select(F.col("v").alias("vertex"), "c")
            .localCheckpoint(eager=True)
        )
        changed = (
            new_state.join(state.withColumnRenamed("c", "old"), "vertex")
            .where(F.col("c") != F.col("old"))
            .count()
        )
        release(state)
        state = new_state
        info["iterations"] += 1
        if changed == 0:
            # fixpoint: later sweeps are no-ops, stop in both modes
            info["converged"] = True
            break
    if n_iter is not None:
        info["iterations"] = n_iter  # fixed-shape contract (rest were no-ops)
    release(und)
    return state.select("vertex", F.col("c").alias("coreness")), info


def coreness(
    edges: DataFrame,
    n_iter: int | None = None,
    max_iter: int = 1000,
    dense_threshold: int = 10_000_000,
) -> tuple[DataFrame, dict]:
    """((vertex, coreness) DataFrame, info).

    n_iter=None (default): iterate to the fixpoint — the result is the EXACT
    coreness.  n_iter=k: run exactly k h-operator sweeps (fixed-shape output
    for the cross-engine oracle; equals exact coreness once k reaches the
    convergence depth, since the fixpoint is stable).

    Path choice by EDGE count (the collected volume), not vertex count:
    below ``dense_threshold`` edges the driver-dense accelerator runs; above,
    the one-shuffle-per-superstep window path (set dense_threshold=0 to force
    it — the scale configuration, exercised in tests)."""
    spark = edges.sparkSession
    m = edges.count()
    if m == 0:
        out = spark.createDataFrame([], schema="vertex long, coreness long")
        return out, {"iterations": 0, "converged": True, "mode": "empty"}
    if m <= dense_threshold:
        return _coreness_dense(spark, edges, n_iter, max_iter)
    return _coreness_shuffle(spark, edges, n_iter, max_iter)
