"""Approximate diameter via deterministic double-sweep BFS.

The paper's third downstream workload (full.pdf §5.4 runs PR, CC and
approximate diameter over the partitions; FSM improves AD runtime by up to
57%).  Double sweep: BFS from a deterministic seed (max-degree vertex, min id
on ties), then BFS from the farthest vertex found (max distance, min id on
ties); the second sweep's eccentricity is the classic diameter lower bound —
exact on trees, near-exact on the small-diameter power-law graphs the
reference targets.

Execution: same broadcast-encoded machinery as pagerank/components — edge
blocks encoded once, ONE stage per BFS level, each partition emitting only
IMPROVED (vertex, dist) rows, fixpoint when nothing improves.  Level count =
diameter, which is small on these graphs.  Above the state threshold the
same sweep can run over the cogroup path; at >5M-vertex scale prefer the
HyperANF sketch operator (graph/hyperanf.py — effective diameter from
per-vertex HLL registers; this module stays the exact paper-parity operator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

_UNREACHED = np.iinfo(np.int64).max


def _bfs_dense(spark, packed, dt, n: int, seed_idx: int, max_levels: int) -> np.ndarray:
    """Dense BFS distances (int64; unreached = _UNREACHED) over the packed
    pickled-numpy edge blocks (see pagerank._pack_edge_blocks); one raw-RDD
    job per level, improved-rows-only return."""
    dist = np.full(n, _UNREACHED, dtype=np.int64)
    dist[seed_idx] = 0
    bc = None
    try:
        for _ in range(max_levels):
            bc = spark.sparkContext.broadcast(dist)

            def scatter(part_iter, _bc=bc, _dt=dt):
                d0 = _bc.value
                cur = None
                for s_b, d_b in part_iter:
                    if cur is None:
                        cur = d0.copy()
                    s = np.frombuffer(s_b, dtype=_dt)
                    d = np.frombuffer(d_b, dtype=_dt)
                    # relax both directions; +1 with overflow guard on UNREACHED
                    cand = np.where(cur[s] < _UNREACHED, cur[s] + 1, _UNREACHED)
                    np.minimum.at(cur, d, cand)
                    cand = np.where(cur[d] < _UNREACHED, cur[d] + 1, _UNREACHED)
                    np.minimum.at(cur, s, cand)
                if cur is not None:
                    imp = np.flatnonzero(cur < d0)
                    if len(imp):
                        yield (imp.astype(_dt).tobytes(), cur[imp].tobytes())

            got = packed.mapPartitions(scatter).collect()
            bc.destroy()
            bc = None
            if not got:
                break
            new = dist.copy()
            for vid_b, dist_b in got:
                np.minimum.at(
                    new, np.frombuffer(vid_b, dtype=dt), np.frombuffer(dist_b, dtype=np.int64)
                )
            if (new == dist).all():
                break
            dist = new
    finally:
        if bc is not None:
            bc.destroy()
    return dist


def _bfs_dense_driver(blocks_l, n: int, seed_idx: int, max_levels: int) -> np.ndarray:
    """Driver-fused dense BFS sweep (the pagerank/CC driver-loop contract):
    under the EDGES_PER_TASK gate the collected blocks are a few MB, so the
    relaxation kernel iterates locally to its fixpoint — identical block
    order and min-relaxation sequence to the level-by-level global sweep
    (the fixpoint is the unique BFS distance vector), with zero Spark jobs
    per sweep."""
    cur = np.full(n, _UNREACHED, dtype=np.int64)
    cur[seed_idx] = 0
    for _ in range(max_levels):
        prev = cur.copy()
        for s, d in blocks_l:
            cand = np.where(cur[s] < _UNREACHED, cur[s] + 1, _UNREACHED)
            np.minimum.at(cur, d, cand)
            cand = np.where(cur[d] < _UNREACHED, cur[d] + 1, _UNREACHED)
            np.minimum.at(cur, s, cand)
        if (cur == prev).all():
            break
    return cur


def bfs_distances(
    edges: DataFrame, source: int, assigned: DataFrame | None = None,
    max_levels: int = 200, broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """(vertex, dist) for the source's component (unreached vertices omitted)."""
    out, _ = _double_sweep_impl(edges, assigned, max_levels, source=source,
                                distances_only=True,
                                broadcast_threshold=broadcast_threshold)
    return out


def approximate_diameter(
    edges: DataFrame, assigned: DataFrame | None = None, max_levels: int = 200,
    broadcast_threshold: int = 5_000_000,
) -> tuple[DataFrame, dict]:
    """One-row (seed, far_vertex, diameter) DataFrame + info dict."""
    return _double_sweep_impl(edges, assigned, max_levels,
                              broadcast_threshold=broadcast_threshold)


def _bfs_kernel(key: tuple, state: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket BFS relaxation: partial = min(dist[v], dist[nbr] + 1)."""
    if len(edges) == 0 or len(state) == 0:
        return pd.DataFrame({"vertex": np.empty(0, np.int64), "partial": np.empty(0, np.int64)})
    verts = state["vertex"].to_numpy(np.int64)
    order = np.argsort(verts, kind="stable")
    verts = verts[order]
    dist = state["dist"].to_numpy(np.int64)[order]
    s = np.searchsorted(verts, edges["src"].to_numpy(np.int64))
    d = np.searchsorted(verts, edges["dst"].to_numpy(np.int64))
    partial = dist.copy()
    np.minimum.at(partial, d, partial[s] + 1)
    np.minimum.at(partial, s, partial[d] + 1)
    return pd.DataFrame({"vertex": verts, "partial": partial})


# sentinel "unreached" distance for the distributed path: +1 per level never
# overflows int64, and any real distance compares smaller
_INF = 1 << 62


def _bfs_static_inputs(edges: DataFrame, assigned: DataFrame):
    """The sweep-invariant checkpointed relations (mirror replicas +
    bucket-aligned edges) — built ONCE per double sweep and shared by both
    BFS passes (they are identical static inputs; rebuilding them per sweep
    doubles the setup shuffles for nothing)."""
    from ..operators.stats import replica_sets

    spark = edges.sparkSession
    replicas = replica_sets(assigned).repartition("vertex").localCheckpoint(eager=True)
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_by_bucket = (
        assigned.select(F.col("bucket").alias("ebkt"), "src", "dst")
        .repartition(shuffle_n, "ebkt")
        .localCheckpoint(eager=True)
    )
    return replicas, edges_by_bucket


def _bfs_shuffle(edges: DataFrame, assigned: DataFrame, seed_vertex: int,
                 max_levels: int, static_inputs=None) -> DataFrame:
    """Fully distributed BFS sweep (no O(n) driver state): the same
    mirror-join + cogroup scatter + min-combine loop as CC's shuffle path
    (components.py), with dist+1 relaxation.  Returns (vertex, dist) with
    unreached = _INF.  Pass static_inputs to reuse the checkpointed relations
    across sweeps (the caller then owns their unpersist)."""
    from ..sources.edges import vertices_of


    owns_static = static_inputs is None
    if owns_static:
        replicas, edges_by_bucket = _bfs_static_inputs(edges, assigned)
    else:
        replicas, edges_by_bucket = static_inputs
    state = (
        vertices_of(edges)
        .select(
            "vertex",
            F.when(F.col("vertex") == seed_vertex, F.lit(0))
            .otherwise(F.lit(_INF)).cast("long").alias("dist"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(max_levels):
        mirror = replicas.join(state, "vertex").select("bucket", "vertex", "dist")
        partials = (
            mirror.groupby("bucket")
            .cogroup(edges_by_bucket.groupby("ebkt"))
            .applyInPandas(_bfs_kernel, schema="vertex long, partial long")
        )
        gathered = partials.groupBy("vertex").agg(F.min("partial").alias("nd"))
        new_state = state.join(gathered, "vertex", "left").select(
            "vertex", F.least(F.col("dist"), F.coalesce("nd", "dist")).alias("dist")
        )
        prev = state
        # lazy checkpoint materialized by the changed-count job (one job
        # per level instead of two; lineage still truncates)
        state = new_state.localCheckpoint(eager=False)
        changed = (
            state.join(prev.select("vertex", F.col("dist").alias("old")), "vertex")
            .where(F.col("dist") != F.col("old"))
            .count()
        )
        release(prev)
        if changed == 0:
            break
    if owns_static:
        release(replicas)
        release(edges_by_bucket)
    return state


def _double_sweep_shuffle(edges, assigned, max_levels, source, distances_only):
    """Distributed double sweep above the broadcast threshold: seeds and
    eccentricities come from DataFrame aggs, never an O(n) driver collect."""
    from ..sources.edges import degrees as degrees_of

    spark = edges.sparkSession
    deg = degrees_of(edges)
    if source is not None:
        seed = int(source)
        # same contract as the dense path's assert: a typo'd source id must
        # fail loudly, not return an empty sweep
        assert deg.where(F.col("vertex") == seed).count() == 1, "unknown source vertex"
    else:
        row = deg.orderBy(F.desc("degree"), F.asc("vertex")).first()
        if row is None:
            return _empty_result(spark, distances_only)
        seed = int(row["vertex"])
    static_inputs = _bfs_static_inputs(edges, assigned)
    try:
        d1 = _bfs_shuffle(edges, assigned, seed, max_levels, static_inputs)
        reached = d1.where(F.col("dist") < _INF).localCheckpoint(eager=True)
        release(d1)
        if distances_only:
            mx = reached.agg(F.max("dist").alias("m")).collect()[0]["m"]
            return reached, {"levels": int(mx) if mx is not None else 0}
        far_row = reached.orderBy(F.desc("dist"), F.asc("vertex")).first()
        ecc1 = int(far_row["dist"])
        far = int(far_row["vertex"])
        comp_size = reached.count()
        d2 = _bfs_shuffle(edges, assigned, far, max_levels, static_inputs)
        diameter = int(
            d2.where(F.col("dist") < _INF).agg(F.max("dist").alias("m")).collect()[0]["m"]
        )
        release(d2)
        release(reached)
    finally:
        release(static_inputs[0])
        release(static_inputs[1])
    out = spark.createDataFrame(
        pd.DataFrame({"seed": [seed], "far_vertex": [far], "diameter": [diameter]})
    )
    return out, {"ecc_sweep1": ecc1, "component_size": comp_size}


def _empty_result(spark, distances_only):
    if distances_only:
        return spark.createDataFrame([], "vertex long, dist long"), {"levels": 0}
    return spark.createDataFrame([], "seed long, far_vertex long, diameter long"), {
        "ecc_sweep1": 0, "component_size": 0,
    }


def _double_sweep_impl(edges, assigned, max_levels, source=None,
                       distances_only=False, broadcast_threshold=5_000_000):
    from ..sources.edges import degrees as degrees_of

    spark = edges.sparkSession
    # persist: the count is the materializing job; the dense path's toPandas
    # then reads the cache instead of recomputing the degree groupBy
    deg_df = degrees_of(edges).persist()
    n = deg_df.count()
    if n == 0:
        release(deg_df)
        return _empty_result(spark, distances_only)
    if n > broadcast_threshold:
        # no O(n) driver state above the threshold — same policy as PR/CC/LP
        assert assigned is not None, "distributed sweep needs the partition assignment"
        release(deg_df)
        return _double_sweep_shuffle(edges, assigned, max_levels, source, distances_only)

    from .pagerank import (
        EDGES_PER_TASK,
        _collect_encoded_blocks,
        _pack_edge_blocks,
    )

    deg_pdf = deg_df.toPandas().sort_values("vertex")
    release(deg_df)
    verts = deg_pdf["vertex"].to_numpy(np.int64)
    degv = deg_pdf["degree"].to_numpy(np.int64)
    bc_verts = spark.sparkContext.broadcast(verts)
    dt = np.int32 if n < 2**31 else np.int64
    base = assigned if assigned is not None else edges.withColumn("bucket", F.spark_partition_id())
    m_edges = int(degv.sum()) // 2
    fused_single_task = m_edges <= EDGES_PER_TASK and max_levels > 1
    packed = None
    blocks_l = None
    try:
        if fused_single_task:
            # one encode+collect job; both sweeps then run on the driver
            blocks_l = _collect_encoded_blocks(spark, base, bc_verts, dt)
        else:
            packed = _pack_edge_blocks(spark, base, bc_verts, dt)

        def sweep(seed_i: int) -> np.ndarray:
            if fused_single_task:
                return _bfs_dense_driver(blocks_l, n, seed_i, max_levels)
            return _bfs_dense(spark, packed, dt, n, seed_i, max_levels)

        if source is not None:
            seed_idx = int(np.searchsorted(verts, source))
            assert seed_idx < n and verts[seed_idx] == source, "unknown source vertex"
        else:
            # deterministic seed: max degree, min id on ties (verts sorted by id)
            seed_idx = int(np.argmax(degv))
        d1 = sweep(seed_idx)
        if distances_only:
            reach = d1 < _UNREACHED
            return (
                spark.createDataFrame(
                    pd.DataFrame({"vertex": verts[reach], "dist": d1[reach]})
                ),
                {"levels": int(d1[reach].max()) if reach.any() else 0},
            )
        reach = d1 < _UNREACHED
        ecc1 = int(d1[reach].max())
        far_idx = int(np.flatnonzero(reach & (d1 == ecc1))[0])  # min id on ties
        d2 = sweep(far_idx)
        reach2 = d2 < _UNREACHED
        diameter = int(d2[reach2].max())
    finally:
        bc_verts.destroy()
        if packed is not None:
            release(packed)
    out = spark.createDataFrame(
        pd.DataFrame(
            {
                "seed": [int(verts[seed_idx])],
                "far_vertex": [int(verts[far_idx])],
                "diameter": [diameter],
            }
        )
    )
    return out, {"ecc_sweep1": ecc1, "component_size": int(reach.sum())}
