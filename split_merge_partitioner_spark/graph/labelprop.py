"""Synchronous label propagation (community detection flavor).

Each superstep every vertex adopts the most frequent label among its
neighbors, ties broken by MIN label; labels init to vertex id; fixed number of
supersteps (synchronous LP can oscillate, so the contract is
iteration-count-exact, matching the NumPy oracle step for step).

The mode/count aggregation is two-level: per-bucket partial (vertex, label,
cnt) from the CSR kernel, then global groupBy(vertex, label).sum ->
argmax-with-min-tie via a single max(struct(cnt, -label)) aggregation — no
window, one shuffle.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

from .gas import at_boundary, truncate


def _label_count_kernel(key: tuple, state: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    if len(edges) == 0 or len(state) == 0:
        return pd.DataFrame(
            {"vertex": np.empty(0, np.int64), "label": np.empty(0, np.int64), "cnt": np.empty(0, np.int64)}
        )
    verts = state["vertex"].to_numpy(np.int64)
    order = np.argsort(verts, kind="stable")
    verts = verts[order]
    lab = state["label"].to_numpy(np.int64)[order]
    s = np.searchsorted(verts, edges["src"].to_numpy(np.int64))
    d = np.searchsorted(verts, edges["dst"].to_numpy(np.int64))
    # neighbor-label multiset per vertex: (receiver, neighbor_label) pairs
    recv = np.concatenate([d, s])
    nlab = np.concatenate([lab[s], lab[d]])
    df = pd.DataFrame({"vertex": verts[recv], "label": nlab})
    out = df.groupby(["vertex", "label"], sort=False).size().reset_index(name="cnt")
    return out.astype({"vertex": np.int64, "label": np.int64, "cnt": np.int64})


def _lp_broadcast(spark, verts: np.ndarray, assigned: DataFrame, n_iter: int):
    """Raw-RDD sub-threshold LP (see pagerank._pagerank_gas_rdd for the cost
    analysis): edge blocks packed once as pickled numpy pairs in a persisted
    RDD; per superstep one raw-RDD job broadcasts the dense label vector,
    each partition pre-aggregates its (vertex, label) mode counts with one
    np.unique over packed codes (labels are dense indices, so code =
    vid * n + lab fits int64 under the broadcast threshold), and the driver
    sums and takes argmax-with-min-tie.  verts is sorted, so min-tie on dense
    indices equals min-tie on original ids; decoded once at the end."""
    from .pagerank import (
        EDGES_PER_TASK,
        _blocks_edge_count,
        _blocks_rdd,
        _collect_block_rows,
        _encoded_blocks_df,
    )

    sc = spark.sparkContext
    bc_verts = sc.broadcast(verts)
    n = len(verts)
    dt = np.int32 if n < 2**31 else np.int64
    label = np.arange(n, dtype=np.int64)
    bc = None
    packed = None
    blocks = None
    try:
        blocks = _encoded_blocks_df(spark, assigned, bc_verts, dt)
        m = _blocks_edge_count(blocks, dt)
        if m <= EDGES_PER_TASK and n_iter > 1:
            # DRIVER-FUSED loop (the pagerank/CC driver-loop contract): one
            # task's worth of blocks collects to a few MB, and the per-step
            # (vertex, label) mode counts over the complete edge set ARE the
            # global counts, so iterating the identical argmax-with-min-tie
            # reduction locally reproduces the driver combine bit for bit —
            # zero Spark jobs in the loop.
            blocks_l = _collect_block_rows(blocks, dt)
            lab = label.copy()
            for _ in range(n_iter):
                vids, labs = [], []
                for s, d in blocks_l:
                    vids.append(np.concatenate([d, s]).astype(np.int64))
                    labs.append(np.concatenate([lab[s], lab[d]]))
                if not vids:
                    break
                code = np.concatenate(vids) * n + np.concatenate(labs)
                uniq, cnt = np.unique(code, return_counts=True)
                agg = pd.DataFrame({"code": uniq, "cnt": cnt.astype(np.int64)})
                agg["vid"] = agg["code"] // n
                agg["lab"] = agg["code"] % n
                agg = agg.sort_values(
                    ["vid", "cnt", "lab"], ascending=[True, False, True]
                )
                best = agg.drop_duplicates("vid")
                new_label = lab.copy()
                new_label[best["vid"].to_numpy(np.int64)] = best["lab"].to_numpy(np.int64)
                lab = new_label
            label = lab
            return spark.createDataFrame(
                pd.DataFrame({"vertex": verts, "label": verts[label]})
            )
        packed = _blocks_rdd(blocks, m)
        for _ in range(n_iter):
            bc = sc.broadcast(label)

            def scatter(part_iter, _bc=bc, _dt=dt, _n=n):
                lab = _bc.value
                vids, labs = [], []
                for s_b, d_b in part_iter:
                    s = np.frombuffer(s_b, dtype=_dt)
                    d = np.frombuffer(d_b, dtype=_dt)
                    vids.append(np.concatenate([d, s]).astype(np.int64))
                    labs.append(np.concatenate([lab[s], lab[d]]))
                if vids:
                    code = np.concatenate(vids) * _n + np.concatenate(labs)
                    uniq, cnt = np.unique(code, return_counts=True)
                    yield (uniq.tobytes(), cnt.astype(np.int64).tobytes())

            got = packed.mapPartitions(scatter).collect()
            bc.destroy()
            bc = None
            codes = np.concatenate(
                [np.frombuffer(c, dtype=np.int64) for c, _ in got]
            ) if got else np.empty(0, np.int64)
            cnts = np.concatenate(
                [np.frombuffer(c, dtype=np.int64) for _, c in got]
            ) if got else np.empty(0, np.int64)
            agg = pd.DataFrame({"code": codes, "cnt": cnts}).groupby("code", sort=False)[
                "cnt"
            ].sum().reset_index()
            agg["vid"] = agg["code"] // n
            agg["lab"] = agg["code"] % n
            # argmax count, tie -> min label
            agg = agg.sort_values(["vid", "cnt", "lab"], ascending=[True, False, True])
            best = agg.drop_duplicates("vid")
            new_label = label.copy()
            new_label[best["vid"].to_numpy(np.int64)] = best["lab"].to_numpy(np.int64)
            label = new_label
    finally:
        if bc is not None:
            bc.destroy()
        if packed is not None:
            release(packed)
        if blocks is not None:
            release(blocks)
        bc_verts.destroy()
    return spark.createDataFrame(
        pd.DataFrame({"vertex": verts, "label": verts[label]})
    )


def label_propagation(
    edges: DataFrame,
    assigned: DataFrame | None = None,
    replicas: DataFrame | None = None,
    n_iter: int = 5,
    mode: str = "gas",
    broadcast_threshold: int = 5_000_000,
) -> DataFrame:
    """Returns (vertex, label) after exactly n_iter synchronous supersteps."""
    from ..sources.edges import vertices_of

    # persist (not localCheckpoint): the count below materializes the cache,
    # one setup job instead of two (the components.py discipline)
    state = (
        vertices_of(edges)
        .select("vertex", F.col("vertex").alias("label"))
        .persist()
    )
    spark = edges.sparkSession
    n = state.count()
    broadcast_state = n <= broadcast_threshold
    if mode == "gas" and broadcast_state:
        assert assigned is not None
        verts = np.sort(
            state.select("vertex").toPandas()["vertex"].to_numpy(np.int64)
        )
        release(state)
        return _lp_broadcast(spark, verts, assigned, n_iter)
    if mode == "gas":
        assert assigned is not None
        if replicas is None:
            from ..operators.stats import replica_sets

            replicas = replica_sets(assigned)
        # lineage-free static inputs: constant-size superstep plans (see
        # pagerank.py); aliased cogroup key avoids the ambiguous self-join
        replicas = replicas.repartition("vertex").localCheckpoint(eager=True)
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        edges_by_bucket = (
            assigned.select(F.col("bucket").alias("ebkt"), "src", "dst")
            .repartition(shuffle_n, "ebkt")
            .localCheckpoint(eager=True)
        )

    for it in range(n_iter):
        if mode == "gas":
            st = F.broadcast(state) if broadcast_state else state
            mirror = replicas.join(st, "vertex").select("bucket", "vertex", "label")
            partials = (
                mirror.groupby("bucket")
                .cogroup(edges_by_bucket.groupby("ebkt"))
                .applyInPandas(_label_count_kernel, schema="vertex long, label long, cnt long")
            )
        else:
            lab_s = state.withColumnRenamed("vertex", "src").withColumnRenamed("label", "ls")
            lab_d = state.withColumnRenamed("vertex", "dst").withColumnRenamed("label", "ld")
            both = edges.join(lab_s, "src").join(lab_d, "dst")
            partials = (
                both.select(F.col("src").alias("vertex"), F.col("ld").alias("label"))
                .unionAll(both.select(F.col("dst").alias("vertex"), F.col("ls").alias("label")))
                .groupBy("vertex", "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
        # argmax count, tie -> min label: max(struct(cnt, -label))
        best = (
            partials.groupBy("vertex", "label")
            .agg(F.sum("cnt").alias("cnt"))
            .groupBy("vertex")
            .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))).alias("m"))
            .select("vertex", (-F.col("m.neg")).alias("new_label"))
        )
        new_state = (F.broadcast(state) if broadcast_state else state).join(
            best, "vertex", "right"
        ).select("vertex", F.coalesce("new_label", "label").alias("label"))
        # broadcasting a lazy chain re-executes it per use -> materialize each
        # superstep when broadcasting; otherwise every 3rd is enough
        if broadcast_state or at_boundary(it, 3):
            state = truncate(new_state, state)
        else:
            state = new_state
    return state.select("vertex", "label")


def label_propagation_warm(
    edges: DataFrame,
    delta_edges: DataFrame,
    prior_labels: DataFrame,
    n_iter: int = 2,
) -> DataFrame:
    """(vertex, label): continue synchronous label propagation on
    base ∪ delta from CHECKPOINTED labels instead of re-running from
    scratch — vertices keep their ``prior_labels`` community, vertices new
    to the merged graph start at their own id, then exactly ``n_iter``
    supersteps of the same adopt-most-frequent / min-tie update.

    Completes the incremental quartet (cc_incremental, warm_pagerank,
    triangle_delta): after a delta batch, community labels re-stabilize in
    a couple of supersteps from a warm init because the perturbation is
    local to the new edges, whereas a cold restart pays the full
    O(diameter-ish) label mixing again.  The update is the plain-Catalyst
    path of :func:`label_propagation` (label join both directions, one
    integer mode count, argmax with min-label tie-break — no floats,
    exactly replayable in SQL).  Prior labels for vertices no longer in
    the merged graph are ignored.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    from ..sources.edges import vertices_of

    merged = (
        edges.select("src", "dst")
        .unionAll(delta_edges.select("src", "dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    state = None
    try:
        state = (
            vertices_of(merged)
            .join(
                prior_labels.select("vertex", F.col("label").alias("__prior__")),
                "vertex",
                "left",
            )
            .select(
                "vertex", F.coalesce("__prior__", F.col("vertex")).alias("label")
            )
            .localCheckpoint(eager=True)
        )
        for _ in range(n_iter):
            lab_s = state.withColumnRenamed("vertex", "src").withColumnRenamed(
                "label", "ls"
            )
            lab_d = state.withColumnRenamed("vertex", "dst").withColumnRenamed(
                "label", "ld"
            )
            both = merged.join(lab_s, "src").join(lab_d, "dst")
            partials = (
                both.select(F.col("src").alias("vertex"), F.col("ld").alias("label"))
                .unionAll(
                    both.select(F.col("dst").alias("vertex"), F.col("ls").alias("label"))
                )
                .groupBy("vertex", "label")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            # every vertex of the merged graph has >= 1 edge, so it always
            # receives a neighbor multiset — best covers the whole universe
            best = (
                partials.groupBy("vertex")
                .agg(
                    F.max(
                        F.struct(F.col("cnt"), (-F.col("label")).alias("neg"))
                    ).alias("m")
                )
                .select("vertex", (-F.col("m.neg")).alias("label"))
            )
            prev = state
            state = best.localCheckpoint(eager=True)
            release(prev)
        out = state
        state = None  # ownership passes to the caller
        return out
    finally:
        release(merged)
        if state is not None:
            release(state)
