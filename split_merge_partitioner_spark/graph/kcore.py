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


def _core_repair_numpy(n, s, d, c, max_iter):
    """Iterate the h-operator to its fixpoint from upper bound ``c``;
    returns (values, sweeps)."""
    it = 0
    for _ in range(max_iter):
        new = _hindex_numpy(n, s, d, c)
        it += 1
        if (new == c).all():
            return new, it
        c = new
    raise RuntimeError("coreness repair did not converge")


def coreness_incremental(
    base_edges: DataFrame,
    delta_edges: DataFrame,
    base_coreness: DataFrame,
    max_iter: int = 1000,
    seq_threshold: int = 8,
    dense_threshold: int = 10_000_000,
) -> tuple[DataFrame, dict]:
    """((vertex, coreness) of base ∪ delta, info) — coreness maintained
    from the checkpointed base coreness after an INSERT-only delta batch
    (the incremental-maintenance family: warm_pagerank / cc_incremental /
    triangle_delta / label-prop warm start).  The result is the EXACT
    coreness of the merged graph (a fixpoint, not an approximation — the
    cross-engine oracle checks it against a cold chained-CTE recompute).

    Three regimes on k = |genuinely new edges|:

    * k = 0 (duplicate-only delta): the base coreness is already the
      fixpoint — one verification sweep.
    * 1 <= k <= ``seq_threshold``: sequential single-edge updates with the
      SUBCORE localization (Sariyüce et al. 2013): inserting (u, v) with
      K = min(core(u), core(v)) can raise only vertices of core exactly K
      reachable from the K-level endpoint(s) through core-K vertices, each
      by at most 1.  Per edge: one equal-level BFS (region rounds) + a
      short h-operator repair from the region-inflated upper bound — the
      rest of the graph stays at its fixpoint, so total sweeps scale with
      the affected region, not the cold convergence depth (which is
      O(path length) on chain-heavy graphs).
    * k > ``seq_threshold``: the batch-sound global bound
      init = min(deg_new, core_old + k) (one edge moves any coreness by at
      most 1); sound but wide — sweeps approach the cold run's as k grows,
      which is the honest cost of batch-replaying a structural property.
      For very large batches a cold run is equivalent; the knob exists so
      callers choose.

    Soundness of every start: the h-operator H is monotone and coreness is
    its fixpoint, so iteration converges to coreness from any x0 with
    core <= x0 <= degree (sandwich, Lu et al. 2016); all three inits are
    such upper bounds (the subcore theorem for the sequential one).
    Insert-only by contract — deletions break the upper-bound direction
    (run cold for those).

    Paths: driver-dense accelerator below ``dense_threshold`` merged
    edges; above it the _coreness_shuffle window kernel with the same
    dispatch (equal-level BFS = frontier joins; constant-size endpoint
    lookups only — no O(n) collects).
    """
    from ..sources.edges import degrees

    spark = base_edges.sparkSession
    cols = [F.col("src").cast("long"), F.col("dst").cast("long")]
    base = base_edges.select(*cols).distinct().localCheckpoint(eager=True)
    new_e = (
        delta_edges.select(*cols)
        .distinct()
        .join(base, ["src", "dst"], "left_anti")
        .localCheckpoint(eager=True)
    )
    merged = base.unionAll(new_e).localCheckpoint(eager=True)
    m = merged.count()
    k_new = new_e.count()
    info: dict = {"k_new": int(k_new)}
    if m == 0:
        release(base), release(new_e), release(merged)
        out = spark.createDataFrame([], schema="vertex long, coreness long")
        return out, {**info, "iterations": 0, "converged": True, "mode": "empty"}
    old = base_coreness.select(
        "vertex", F.col("coreness").cast("long").alias("old")
    )

    if m <= dense_threshold:
        deltas = new_e.toPandas()
        bp = base.toPandas()
        op = old.toPandas()
        verts = np.unique(
            np.concatenate(
                [
                    bp["src"].to_numpy(np.int64), bp["dst"].to_numpy(np.int64),
                    deltas["src"].to_numpy(np.int64), deltas["dst"].to_numpy(np.int64),
                ]
            )
        )
        n = len(verts)
        c = np.zeros(n, np.int64)
        op_v = op["vertex"].to_numpy(np.int64)
        ov = np.searchsorted(verts, op_v)
        # membership-validated init: a base_coreness vertex absent from the
        # merged edge set would otherwise write into a DIFFERENT vertex's
        # slot (or index past the end) and silently seed the monotone
        # fixpoint below its true value; dropping non-members matches the
        # shuffle path (whose join discards them), so both paths agree on
        # out-of-contract (stale/superset) checkpoints
        valid = (ov < n) & (verts[np.minimum(ov, n - 1)] == op_v)
        c[ov[valid]] = op["old"].to_numpy(np.int64)[valid]
        bs = np.searchsorted(verts, bp["src"].to_numpy(np.int64))
        bd = np.searchsorted(verts, bp["dst"].to_numpy(np.int64))
        ds = np.searchsorted(verts, deltas["src"].to_numpy(np.int64))
        dd = np.searchsorted(verts, deltas["dst"].to_numpy(np.int64))
        info["mode"] = "dense"
        sweeps = 0
        if k_new == 0:
            c, it = _core_repair_numpy(n, bs, bd, c, max_iter)
            sweeps = it
        elif k_new <= seq_threshold:
            cur_s, cur_d = bs, bd
            for i in range(k_new):
                u, v = int(ds[i]), int(dd[i])
                cur_s = np.append(cur_s, u)
                cur_d = np.append(cur_d, v)
                ku, kv = int(c[u]), int(c[v])
                K = min(ku, kv)
                seeds = [w for w, kw in ((u, ku), (v, kv)) if kw == K]
                # equal-level BFS over the current edge set
                lvl = c == K
                mask_s = lvl[cur_s] & lvl[cur_d]
                es_l, ed_l = cur_s[mask_s], cur_d[mask_s]
                region = np.zeros(n, bool)
                region[seeds] = True
                while True:
                    touch = region[es_l] | region[ed_l]
                    grown = region.copy()
                    grown[es_l[touch]] = True
                    grown[ed_l[touch]] = True
                    if (grown == region).all():
                        break
                    region = grown
                deg_cur = np.zeros(n, np.int64)
                np.add.at(deg_cur, cur_s, 1)
                np.add.at(deg_cur, cur_d, 1)
                x0 = c.copy()
                x0[region] = np.minimum(deg_cur[region], c[region] + 1)
                c, it = _core_repair_numpy(n, cur_s, cur_d, x0, max_iter)
                sweeps += it
        else:
            deg_cur = np.zeros(n, np.int64)
            ms = np.concatenate([bs, ds])
            md = np.concatenate([bd, dd])
            np.add.at(deg_cur, ms, 1)
            np.add.at(deg_cur, md, 1)
            x0 = np.minimum(deg_cur, c + k_new)
            c, sweeps = _core_repair_numpy(n, ms, md, x0, max_iter)
        info["iterations"] = int(sweeps)
        info["converged"] = True
        out = spark.createDataFrame(pd.DataFrame({"vertex": verts, "coreness": c}))
        release(base), release(new_e), release(merged)
        return out, info

    # ---------------- shuffle path ----------------
    info["mode"] = "shuffle"
    deg = degrees(merged).select("vertex", F.col("degree").cast("long"))
    state = (
        deg.join(old, "vertex", "left")
        .select("vertex", F.coalesce("old", F.lit(0)).alias("c"))
        .localCheckpoint(eager=True)
    )
    scratch: list[DataFrame] = [base, new_e, merged, state]

    def _ck(df):
        out = df.localCheckpoint(eager=True)
        scratch.append(out)
        return out

    w = Window.partitionBy("v").orderBy(F.desc("cu"), F.asc("b"))
    vset = state.select("vertex").localCheckpoint(eager=True)
    scratch.append(vset)

    def _repair(edges_now, st):
        und = _ck(
            edges_now.select(F.col("src").alias("a"), F.col("dst").alias("b"))
            .unionAll(
                edges_now.select(F.col("dst").alias("a"), F.col("src").alias("b"))
            )
        )
        sweeps = 0
        for _ in range(max_iter):
            vals = und.join(st.withColumnRenamed("vertex", "b"), "b").select(
                F.col("a").alias("v"), "b", F.col("c").alias("cu")
            )
            agg = (
                vals.withColumn("rn", F.row_number().over(w))
                .groupBy("v")
                .agg(F.max(F.least("rn", "cu")).alias("cagg"))
                .select(F.col("v").alias("vertex"), "cagg")
            )
            # keep every merged vertex in the state: mid-replay a future
            # delta vertex has no edges yet — its current core IS 0, and
            # dropping the row would make neighbors undershoot (the sweep
            # start must stay a pointwise upper bound)
            new_state = _ck(
                vset.join(agg, "vertex", "left").select(
                    "vertex", F.coalesce("cagg", F.lit(0)).alias("c")
                )
            )
            changed = (
                new_state.join(st.withColumnRenamed("c", "oldc"), "vertex")
                .where(F.col("c") != F.col("oldc"))
                .count()
            )
            st = new_state
            sweeps += 1
            if changed == 0:
                return st, sweeps
        raise RuntimeError("coreness repair did not converge")

    try:
        total = 0
        if k_new == 0:
            state, total = _repair(merged, state)
        elif k_new <= seq_threshold:
            erows = new_e.collect()  # <= seq_threshold rows, constant-size
            cur = base
            for r in erows:
                cur = _ck(
                    cur.unionAll(
                        spark.createDataFrame([(r.src, r.dst)], "src long, dst long")
                    )
                )
                kk = {
                    x.vertex: x.c
                    for x in state.where(
                        F.col("vertex").isin(r.src, r.dst)
                    ).collect()
                }  # 2-row lookup
                K = min(kk.get(r.src, 0), kk.get(r.dst, 0))
                seeds = [
                    w0 for w0 in (r.src, r.dst) if kk.get(w0, 0) == K
                ]
                lvl = state.where(F.col("c") == K).select("vertex")
                undc = _ck(
                    cur.select(F.col("src").alias("a"), F.col("dst").alias("b"))
                    .unionAll(
                        cur.select(F.col("dst").alias("a"), F.col("src").alias("b"))
                    )
                    .join(lvl.withColumnRenamed("vertex", "a"), "a")
                    .join(lvl.withColumnRenamed("vertex", "b"), "b")
                )
                region = _ck(
                    spark.createDataFrame([(s_,) for s_ in seeds], "vertex long")
                )
                frontier = region
                while True:
                    nxt = (
                        undc.join(frontier.withColumnRenamed("vertex", "a"), "a")
                        .select(F.col("b").alias("vertex"))
                        .distinct()
                        .join(region, "vertex", "left_anti")
                    )
                    if nxt.isEmpty():
                        break
                    frontier = _ck(nxt)
                    region = _ck(region.unionAll(frontier))
                deg_cur = degrees(cur).select(
                    "vertex", F.col("degree").cast("long")
                )
                state = _ck(
                    state.join(
                        region.withColumn("inr", F.lit(1)), "vertex", "left"
                    )
                    .join(deg_cur, "vertex", "left")
                    .select(
                        "vertex",
                        F.when(
                            F.col("inr").isNotNull(),
                            F.least(
                                F.coalesce("degree", F.lit(0)), F.col("c") + 1
                            ),
                        )
                        .otherwise(F.col("c"))
                        .alias("c"),
                    )
                )
                state, it = _repair(cur, state)
                total += it
        else:
            state = _ck(
                state.join(deg, "vertex")
                .select(
                    "vertex", F.least("degree", F.col("c") + k_new).alias("c")
                )
            )
            state, total = _repair(merged, state)
        info["iterations"] = total
        info["converged"] = True
        out = state.select("vertex", F.col("c").alias("coreness")).localCheckpoint(
            eager=True
        )
        return out, info
    finally:
        for df in scratch:
            release(df)
