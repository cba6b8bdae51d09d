"""Onion decomposition — k-core peeling with layer indices (Hébert-Dufresne,
Grochow & Allard, "Multi-scale structure and topological anomaly detection
via a new network statistic: the onion decomposition", Sci. Rep. 2016).

Coreness says WHICH shell a vertex ends in; the onion layer says WHEN it
peels — the internal depth of the vertex inside its shell, the signal the
paper uses to tell tree-like from loopy from geometric structure at the
same degree sequence.

The algorithm is the batched peel: with k = current core level,
repeatedly remove ALL vertices of remaining degree <= k as one layer;
when the remaining minimum degree exceeds k, k rises to it.  Coreness of
a vertex = k at its removal (identical to the h-index fixpoint kcore.py
computes — cross-checked in tests), layer = its batch's 1-based index.

Unlike coreness, the layer index has no local fixpoint characterization —
it is DEFINED by the global peel order — so the distributed executor pays
one degree-recount round per LAYER (not per vertex: batching keeps rounds
at O(#layers), typically O(sqrt(n)) on heavy-tailed graphs and ~50 on the
test fixtures, vs O(n) for the sequential textbook peel).  Dual path per
kcore.py: below ``dense_threshold`` edges the peel runs vectorized on the
driver; above, each round is two semi-joins (alive-subgraph degrees), one
constant-size scalar collect (the min), and an anti-join, with per-round
relations localCheckpointed and released (the scc.py round discipline).
Per-layer assignment relations stay distributed and are unioned
lineage-free at the end — never collected.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def _onion_dense(spark, edges: DataFrame, max_rounds: int):
    from ..sources.edges import vertices_of

    verts = np.sort(vertices_of(edges).toPandas()["vertex"].to_numpy(np.int64))
    n = len(verts)
    e = edges.select("src", "dst").toPandas()
    s = np.searchsorted(verts, e["src"].to_numpy(np.int64))
    d = np.searchsorted(verts, e["dst"].to_numpy(np.int64))
    alive = np.ones(n, bool)
    core = np.zeros(n, np.int64)
    layer = np.zeros(n, np.int64)
    cur = 0
    rounds = 0
    dg = np.bincount(s, minlength=n) + np.bincount(d, minlength=n)
    while alive.any():
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"onion peel did not finish in {max_rounds} rounds")
        cur = max(cur, int(dg[alive].min()))
        rm = alive & (dg <= cur)
        core[rm] = cur
        layer[rm] = rounds
        alive &= ~rm
        keep = alive[s] & alive[d]
        dg = np.bincount(s[keep], minlength=n) + np.bincount(d[keep], minlength=n)
    out = spark.createDataFrame(
        [(int(v), int(c), int(l)) for v, c, l in zip(verts, core, layer)],
        "vertex long, coreness long, layer long",
    )
    return out, {"rounds": rounds, "mode": "dense"}


def _onion_shuffle(spark, edges: DataFrame, max_rounds: int):
    from ..sources.edges import vertices_of

    e = edges.select("src", "dst").localCheckpoint(eager=True)
    alive = vertices_of(e).localCheckpoint(eager=True)
    layers: list[DataFrame] = []
    cur = 0
    rounds = 0
    try:
        while True:
            n_alive = alive.count()
            if n_alive == 0:
                break
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(f"onion peel did not finish in {max_rounds} rounds")
            ae = (
                e.join(alive.withColumnRenamed("vertex", "src"), "src", "leftsemi")
                .join(alive.withColumnRenamed("vertex", "dst"), "dst", "leftsemi")
            )
            ends = ae.select(F.col("src").alias("v")).unionAll(
                ae.select(F.col("dst").alias("v"))
            )
            dg = (
                alive.join(
                    ends.groupBy(F.col("v").alias("vertex")).agg(
                        F.count(F.lit(1)).cast("long").alias("dg")
                    ),
                    "vertex",
                    "left",
                )
                .select("vertex", F.coalesce("dg", F.lit(0)).alias("dg"))
                .localCheckpoint(eager=True)
            )
            mn = dg.agg(F.min("dg")).collect()[0][0]  # constant-size scalar
            cur = max(cur, int(mn))
            rm = dg.where(F.col("dg") <= cur)
            layers.append(
                rm.select(
                    "vertex",
                    F.lit(cur).cast("long").alias("coreness"),
                    F.lit(rounds).cast("long").alias("layer"),
                ).localCheckpoint(eager=True)
            )
            new_alive = alive.join(
                rm.select("vertex"), "vertex", "left_anti"
            ).localCheckpoint(eager=True)
            release(alive)
            release(dg)
            alive = new_alive
    finally:
        release(e)
        release(alive)
    if not layers:
        out = spark.createDataFrame([], "vertex long, coreness long, layer long")
    else:
        out = layers[0]
        for df in layers[1:]:
            out = out.unionAll(df)
    return out, {"rounds": rounds, "mode": "shuffle"}


def onion_decomposition(
    edges: DataFrame,
    max_rounds: int = 100_000,
    dense_threshold: int = 10_000_000,
) -> tuple[DataFrame, dict]:
    """((vertex, coreness, layer) DataFrame, info) for the undirected simple
    graph.  coreness matches kcore.py's h-index fixpoint exactly; layer is
    the 1-based peel batch.  Path choice by edge count as in coreness()."""
    spark = edges.sparkSession
    m = edges.count()
    if m == 0:
        out = spark.createDataFrame([], "vertex long, coreness long, layer long")
        return out, {"rounds": 0, "mode": "empty"}
    if m <= dense_threshold:
        return _onion_dense(spark, edges, max_rounds)
    return _onion_shuffle(spark, edges, max_rounds)
