"""Connected components: min-label propagation to exact fixpoint.

component(v) = min vertex id reachable from v (FIXTURES.md F7).  Same GAS
machinery as PageRank with a MIN combiner; converges in O(diameter) supersteps
on the small-diameter power-law graphs the reference targets.  Exact-match
oracle: NumPy union-find (tests/oracles.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release




def _min_label_kernel(key: tuple, state: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    if len(edges) == 0 or len(state) == 0:
        return pd.DataFrame({"vertex": np.empty(0, np.int64), "partial": np.empty(0, np.int64)})
    verts = state["vertex"].to_numpy(np.int64)
    order = np.argsort(verts, kind="stable")
    verts = verts[order]
    lab = state["label"].to_numpy(np.int64)[order]
    s = np.searchsorted(verts, edges["src"].to_numpy(np.int64))
    d = np.searchsorted(verts, edges["dst"].to_numpy(np.int64))
    partial = lab.copy()
    np.minimum.at(partial, d, lab[s])
    np.minimum.at(partial, s, lab[d])
    return pd.DataFrame({"vertex": verts, "partial": partial})


def _cc_broadcast(spark, verts: np.ndarray, assigned: DataFrame, max_iter: int):
    """Raw-RDD sub-threshold executor (see pagerank._pagerank_gas_rdd for the
    cost analysis): edge blocks dense-encoded and packed ONCE as pickled numpy
    pairs in a persisted RDD; each superstep is a single raw-RDD job shipping
    the label vector via sc.broadcast, every partition returning only its
    IMPROVED (vid, min_label) rows (shrinks toward 0 as labels converge), the
    driver min-combines and checks convergence for free — no Catalyst/Arrow
    in the loop."""
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
    label = np.arange(n, dtype=np.int64)  # dense ids; decoded via verts at the end
    info = {"iterations": 0, "converged": False}
    bc = None
    packed = None
    blocks = None
    try:
        blocks = _encoded_blocks_df(spark, assigned, bc_verts, dt)
        m = _blocks_edge_count(blocks, dt)
        if m <= EDGES_PER_TASK and max_iter > 1:
            # DRIVER-FUSED fixpoint (same contract as the single-task
            # fusion it replaces): one task's worth of blocks is a few MB,
            # so collect them (partition order preserved) and iterate the
            # identical kernel locally — the min-relaxation sequence equals
            # the driver-combined one element for element, without the
            # coalesce(1) Python task or the label broadcast.
            blocks_l = _collect_block_rows(blocks, dt)
            cur = label.copy()
            converged = False
            for _ in range(max_iter):
                prev = cur.copy()
                for s, d in blocks_l:
                    np.minimum.at(cur, d, cur[s])
                    np.minimum.at(cur, s, cur[d])
                info["iterations"] += 1
                if (cur == prev).all():
                    converged = True
                    break
            label = cur
            info["converged"] = converged
        else:
            packed = _blocks_rdd(blocks, m)
            for it in range(max_iter):
                bc = sc.broadcast(label)

                def scatter(part_iter, _bc=bc, _dt=dt):
                    c = _bc.value
                    partial = None
                    for s_b, d_b in part_iter:
                        if partial is None:
                            partial = c.copy()
                        s = np.frombuffer(s_b, dtype=_dt)
                        d = np.frombuffer(d_b, dtype=_dt)
                        np.minimum.at(partial, d, partial[s])
                        np.minimum.at(partial, s, partial[d])
                    if partial is not None:
                        imp = np.flatnonzero(partial < c)
                        if len(imp):
                            yield (imp.astype(_dt).tobytes(), partial[imp].tobytes())

                got = packed.mapPartitions(scatter).collect()
                bc.destroy()
                bc = None
                info["iterations"] = it + 1
                if not got:
                    info["converged"] = True
                    break
                new = label.copy()
                for vid_b, lab_b in got:
                    np.minimum.at(
                        new, np.frombuffer(vid_b, dtype=dt), np.frombuffer(lab_b, dtype=np.int64)
                    )
                if (new == label).all():
                    info["converged"] = True
                    break
                label = new
    finally:
        if bc is not None:
            bc.destroy()
        if packed is not None:
            release(packed)
        if blocks is not None:
            release(blocks)
        bc_verts.destroy()
    out = spark.createDataFrame(
        pd.DataFrame({"vertex": verts, "component": verts[label]})
    )
    return out, info


def connected_components(
    edges: DataFrame,
    assigned: DataFrame | None = None,
    replicas: DataFrame | None = None,
    mode: str = "gas",
    max_iter: int = 200,
    broadcast_threshold: int = 5_000_000,
) -> tuple[DataFrame, dict]:
    """Returns ((vertex, component), info).  Exact fixpoint."""
    from ..sources.edges import vertices_of

    # persist (not localCheckpoint): the count below is the materializing
    # job, so the vertex-state setup costs one job instead of two; the
    # sub-threshold toPandas and the distributed loop's first round both
    # read the cache
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
        return _cc_broadcast(spark, verts, assigned, max_iter)
    if mode == "gas":
        assert assigned is not None
        if replicas is None:
            from ..operators.stats import replica_sets

            replicas = replica_sets(assigned)
        # lineage-free static inputs: constant-size superstep plans (see
        # pagerank.py for the rationale); aliased cogroup key avoids the
        # ambiguous-attribute self-join
        replicas = replicas.repartition("vertex").localCheckpoint(eager=True)
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        edges_by_bucket = (
            assigned.select(F.col("bucket").alias("ebkt"), "src", "dst")
            .repartition(shuffle_n, "ebkt")
            .localCheckpoint(eager=True)
        )

    info = {"iterations": 0, "converged": False}
    for it in range(max_iter):
        if mode == "gas":
            st = F.broadcast(state) if broadcast_state else state
            mirror = replicas.join(st, "vertex").select("bucket", "vertex", "label")
            partials = (
                mirror.groupby("bucket")
                .cogroup(edges_by_bucket.groupby("ebkt"))
                .applyInPandas(_min_label_kernel, schema="vertex long, partial long")
            )
            gathered = partials.groupBy("vertex").agg(F.min("partial").alias("new_label"))
        else:
            lab_s = state.withColumnRenamed("vertex", "src").withColumnRenamed("label", "ls")
            lab_d = state.withColumnRenamed("vertex", "dst").withColumnRenamed("label", "ld")
            both = edges.join(lab_s, "src").join(lab_d, "dst")
            gathered = (
                both.select(F.col("src").alias("vertex"), F.least("ls", "ld").alias("new_label"))
                .unionAll(both.select(F.col("dst").alias("vertex"), F.least("ls", "ld").alias("new_label")))
                .groupBy("vertex")
                .agg(F.min("new_label").alias("new_label"))
            )
        new_state = (F.broadcast(state) if broadcast_state else state).join(
            gathered, "vertex", "right"
        ).select(
            "vertex", F.least(F.col("label"), F.coalesce("new_label", "label")).alias("label")
        )
        prev = state
        # lazy checkpoint materialized by the changed-count job: one job
        # per superstep instead of two (lineage still truncates)
        state = new_state.localCheckpoint(eager=False)
        changed = (
            state.join(prev.select("vertex", F.col("label").alias("old")), "vertex")
            .where(F.col("label") != F.col("old"))
            .count()
        )
        release(prev)
        info["iterations"] = it + 1
        if changed == 0:
            info["converged"] = True
            break
    return state.select("vertex", F.col("label").alias("component")), info


def connected_components_stars(
    edges: DataFrame, max_rounds: int = 50
) -> tuple[DataFrame, dict]:
    """((vertex, component), info) via alternating large-star/small-star
    contraction (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the O(log² n)-round alternative to min-label
    propagation's O(diameter) supersteps.

    Why a second exact CC path: the GAS/join modes above converge in
    diameter supersteps — ideal on small-diameter link graphs, painful on
    high-diameter ones (meshes, chains, road networks).  Star contraction
    converges in O(log² n) rounds REGARDLESS of diameter, entirely in
    Catalyst (groupBy-min + join per star step, zero Python), and the
    edge relation only shrinks: each round rewires edges toward component
    minima, so shuffle volume decays geometrically after the first rounds.

    Per round (2 star steps, each 2 exchanges on the current edge set):
      large-star: ∀ v ∈ Γ(u) with v > u: emit (v, m(u)),
      small-star: ∀ v ∈ Γ(u) with v ≤ u: emit (v, m(u)),
    where m(u) = min(Γ(u) ∪ {u}); self-loops dropped, canonical dedup.
    Fixpoint = the canonical edge set is unchanged by a full round,
    checked with one aggregate (count + two exact BIGINT moments — sums
    of src and dst over the canonical set; set equality of the monotone
    contraction sequence, not a probabilistic hash).  At the fixpoint the
    edges form min-rooted stars: label(v) = its unique smaller endpoint,
    roots and isolated vertices label themselves.
    """
    from ..sources.edges import vertices_of

    spark = edges.sparkSession
    universe = vertices_of(edges).localCheckpoint(eager=True)
    cur = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )

    def _star(e: DataFrame, large: bool) -> DataFrame:
        nb = e.select(F.col("src").alias("u"), F.col("dst").alias("v")).unionAll(
            e.select(F.col("dst").alias("u"), F.col("src").alias("v"))
        )
        # m(u) = min(Γ(u) ∪ {u}); for small-star the min over ALL neighbors
        # equals the min over the smaller ones whenever any exists (and is
        # u itself otherwise), so one groupBy serves both steps
        mins = nb.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("mv", "u").alias("m"))
        cond = F.col("v") > F.col("u") if large else F.col("v") < F.col("u")
        rewired = nb.join(mins, "u").where(cond).select("v", "m")
        if not large:
            # small-star also links each center to m — dropping this orphans
            # u from its smaller neighborhood and breaks connectivity
            rewired = rewired.unionAll(mins.select(F.col("u").alias("v"), "m"))
        return (
            rewired.select(
                F.least("v", "m").alias("src"), F.greatest("v", "m").alias("dst")
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )

    def _sig(e: DataFrame):
        row = e.agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("src").alias("ss"),
            F.sum("dst").alias("sd"),
        ).collect()[0]
        return (row["c"], row["ss"], row["sd"])

    info = {"rounds": 0, "converged": False}
    sig = _sig(cur)
    for r in range(max_rounds):
        # lazy checkpoint: the signature aggregate right below is the
        # materializing job, so each round costs ONE job instead of an
        # eager-checkpoint job plus the aggregate (lineage still truncates)
        nxt = _star(_star(cur, large=True), large=False).localCheckpoint(eager=False)
        nsig = _sig(nxt)
        release(cur)
        cur = nxt
        info["rounds"] = r + 1
        if nsig == sig:
            info["converged"] = True
            break
        sig = nsig
    if not info["converged"]:
        raise RuntimeError(
            f"connected_components_stars: no fixpoint after {max_rounds} "
            "rounds — labels are only meaningful at the star fixpoint "
            "(a vertex could otherwise carry multiple labels); raise "
            "max_rounds (convergence is O(log² n) rounds)."
        )
    labels = cur.select(F.col("dst").alias("vertex"), F.col("src").alias("label"))
    # at a true fixpoint the edge set is a union of min-rooted stars, so
    # every vertex appears as dst at most once; guard the (astronomically
    # unlikely) count+moments signature collision by asserting it
    dup = labels.groupBy("vertex").count().where(F.col("count") > 1)
    if not dup.isEmpty():
        raise RuntimeError(
            "connected_components_stars: fixpoint signature collision — "
            "label relation is not single-valued per vertex"
        )
    # materialize the result and release the internal checkpoints (the
    # converged star relation and the vertex universe): a lazily-returned
    # plan would pin them forever — callers cannot see, let alone release,
    # a sub-call's scratch.  Costs one small job (n rows); makes the result
    # itself releasable (LogicalRDD) under the storage-budget discipline.
    out = (
        universe.join(labels, "vertex", "left")
        .select("vertex", F.coalesce("label", "vertex").alias("component"))
        .localCheckpoint(eager=True)
    )
    release(cur)
    release(universe)
    return out, info


def component_size_histogram(edges: DataFrame, max_rounds: int = 50) -> DataFrame:
    """(size, n_components): how many connected components have each vertex
    count — the fragmentation profile (giant-component share, isolated-pair
    long tail) read off the star-contraction labels.

    Two map-side-combined aggregates over the (vertex, component) relation;
    the histogram is at most |distinct sizes| rows, so everything after the
    CC fixpoint is trivially small.  Exact integers end to end."""
    comps, _ = connected_components_stars(edges, max_rounds=max_rounds)
    sizes = comps.groupBy("component").agg(F.count(F.lit(1)).alias("size"))
    return sizes.groupBy("size").agg(
        F.count(F.lit(1)).cast("long").alias("n_components")
    )


def connected_components_incremental(
    labels: DataFrame, delta_edges: DataFrame, max_rounds: int = 50
) -> tuple[DataFrame, dict]:
    """((vertex, component), info) for the graph G ∪ delta, given only the
    precomputed min-label components of G — the daily-update path: at
    100 TB you do not re-run CC over the full link graph because a day's
    crawl added 0.1% of the edges.

    The output is IDENTICAL to a full recompute (component = min reachable
    vertex id), because min-labels compose: the merged component's id is
    the min over the merged groups' ids, which is exactly what min-label
    CC computes on the COMPONENT GRAPH — the graph whose vertices are the
    base components touched by delta and whose edges are the delta edges
    with endpoints mapped through the base labels.  That graph has at most
    |delta| edges, so the work is:

      1. one join of delta endpoints against the label table (broadcast
         delta — the big side never shuffles); brand-new vertices label
         themselves, preserving the min-label invariant,
      2. star-contraction CC (O(log² n_touched) rounds, Catalyst-only) on
         the ≤|delta|-edge component graph,
      3. one broadcast join of the (touched_component → merged_component)
         mapping — again ≤ 2·|delta| rows — back onto the label table.

    Nothing proportional to |G| is shuffled; the label table is scanned
    twice with broadcast-joined small sides.  ``labels`` must be a
    min-label relation ((vertex, component), component = min vertex id of
    the component, every vertex present exactly once) — the output of
    connected_components / connected_components_stars / this function,
    making the operator closed under chaining batches.
    """
    from ..sources.edges import vertices_of

    delta = (
        delta_edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    scratch = [delta]
    try:
        # 1. endpoints → base components; unseen vertices are their own
        # (singleton) components, keeping the min-label invariant
        new_verts = (
            vertices_of(delta)
            .join(labels.select("vertex"), "vertex", "left_anti")
            .select("vertex", F.col("vertex").alias("component"))
        )
        all_lab = labels.select("vertex", "component").unionAll(new_verts)
        all_lab = all_lab.localCheckpoint(eager=True)
        scratch.append(all_lab)
        mapped = (
            delta.join(
                all_lab.select(F.col("vertex").alias("src"), F.col("component").alias("csrc")),
                "src",
            )
            .join(
                all_lab.select(F.col("vertex").alias("dst"), F.col("component").alias("cdst")),
                "dst",
            )
            .select(
                F.least("csrc", "cdst").alias("src"),
                F.greatest("csrc", "cdst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
            # lazy: the count below is the materializing job
            .localCheckpoint(eager=False)
        )
        scratch.append(mapped)
        n_links = mapped.count()
        if n_links == 0:
            out = all_lab.select("vertex", "component")
            return out.localCheckpoint(eager=True), {
                "rounds": 0,
                "merged_links": 0,
                "converged": True,
            }
        # 2. CC on the component graph (diameter-free star contraction)
        merged, info = connected_components_stars(mapped, max_rounds=max_rounds)
        # 3. relabel: only touched components appear in the mapping
        remap = merged.select(
            F.col("vertex").alias("component"), F.col("component").alias("merged")
        ).where(F.col("component") != F.col("merged"))
        out = (
            all_lab.join(F.broadcast(remap), "component", "left")
            .select("vertex", F.coalesce("merged", "component").alias("component"))
            .localCheckpoint(eager=True)
        )
        return out, {
            "rounds": info["rounds"],
            "merged_links": n_links,
            "converged": info["converged"],
        }
    finally:
        for df in scratch:
            release(df)
