"""HyperANF: approximate neighborhood function + effective diameter via
per-vertex HyperLogLog registers (Boldi, Rosa & Vigna, WWW 2011).

The reference computes an exact double-sweep diameter bound
(/root/reference/src/main.cpp has no diameter op; our graph/diameter.py is the
north-star exact path, driver-dense below / cogroup BFS above threshold).
HyperANF is the principled 10^12-edge complement: per-vertex state is a fixed
64-register HLL sketch, the superstep is a register-wise max-merge over
neighbors — structurally the CC label min-merge with a 64-byte row instead of
an 8-byte label — so both executors here mirror components.py:

- broadcast path (below ``broadcast_threshold`` vertices): packed-block
  raw-RDD executor (pagerank._pack_edge_blocks); one job per superstep,
  improved-rows-only collect, driver max-combine.
- shuffle path (the cluster-scale configuration): one JVM-only shuffle per
  superstep — neighbor regs unioned both directions, then a single
  groupBy(vertex) with 64 columnar MAX aggregations (map-side partial
  aggregation; no explode, no Python in the loop).

Determinism / oracle: the vertex hash is splitmix64 (pure integer
arithmetic), register updates are max-merges of deterministic values, and the
registers at superstep t equal ``max over {u : dist(u,v) <= t}`` regardless of
execution order — so every path yields bit-identical registers and the driver
oracle can recompute N(t) in DuckDB from an all-pairs recursive-CTE BFS
(__spark_entry__.oracle_sql "hyperanf_nf").

Scale notes (100 TB): the shuffle path's default state layout is PACKED — the
64 registers (values <= 59) live as 7 byte-lanes in each of 10 longs
(array<bigint>(10), ~80B payload vs ~270B for array<int>(64); 7 lanes keep
the SWAR guards clear of the int64 sign bit — ANSI-mode-safe).  The register
max-merge is a SWAR expression (guard-bit compare per byte lane, pure bitwise
JVM ops) applied via groupBy(vertex).agg(collect_list) + reduce/zip_with.
Why collect_list and not 64 columnar MAXes: on an average-degree graph each
map task sees mostly-distinct vertices, so hash partial aggregation barely
reduces ROW count while inflating row WIDTH to the 64-slot agg buffer —
shipping the 10-long packed rows uncombined is the smaller shuffle (measured
1.76x fewer shuffle bytes/superstep — BENCH/BASELINE.md r4 shuffle-bytes
table).  The trade is CPU: the SWAR reduce costs ~1.7x more wall clock than
the 64-MAX plan in a single network-free JVM (same table), so the default
optimizes the cluster bottleneck (network shuffle) — pass ``packed=False``
on CPU-bound local deployments.  The unpacked 64-column-MAX path doubles as
the oracle twin (packed==unpacked bit-exact, tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

_B = 6
_M = 64  # registers per vertex = 2**_B
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)
_MAX_RANK = 64 - _B + 1  # w == 0 -> all remaining bits zero

_C1 = np.uint64(0x9E3779B97F4A7C15)
_C2 = np.uint64(0xBF58476D1CE4E5B9)
_C3 = np.uint64(0x94D049BB133111EB)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer over uint64 (public-domain constants,
    Steele/Lea/Flood 2014) — mirrored bit-for-bit by the DuckDB oracle in
    HUGEINT arithmetic."""
    with np.errstate(over="ignore"):
        z = x + _C1
        z = (z ^ (z >> np.uint64(30))) * _C2
        z = (z ^ (z >> np.uint64(27))) * _C3
        return z ^ (z >> np.uint64(31))


def init_registers(verts: np.ndarray) -> np.ndarray:
    """(n, 64) uint8 register matrix seeded with each vertex's own hash:
    register index = low 6 hash bits, rank = trailing zeros of the remaining
    58 bits + 1 (capped when they are all zero)."""
    h = splitmix64(verts.astype(np.int64).view(np.uint64))
    j = (h & np.uint64(_M - 1)).astype(np.int64)
    w = h >> np.uint64(_B)
    with np.errstate(over="ignore", divide="ignore"):
        low = w & (~w + np.uint64(1))  # lowest set bit (w=0 -> 0)
        # exact: low is a power of two <= 2^57, log2 is exact in float64
        tz = np.where(w == 0, _MAX_RANK - 1, np.log2(np.maximum(low, 1).astype(np.float64)))
    r = (tz + 1).astype(np.uint8)
    regs = np.zeros((len(verts), _M), dtype=np.uint8)
    regs[np.arange(len(verts)), j] = r
    return regs


def estimate_cardinalities(regs: np.ndarray) -> np.ndarray:
    """Standard HLL estimate per row: harmonic mean with the small-range
    linear-counting correction (no 64-bit large-range correction needed)."""
    s = np.ldexp(1.0, -regs.astype(np.int64)).sum(axis=1)
    E = _ALPHA * _M * _M / s
    V = (regs == 0).sum(axis=1)
    small = (E <= 2.5 * _M) & (V > 0)
    with np.errstate(divide="ignore"):
        E_small = _M * np.log(_M / np.maximum(V, 1))
    return np.where(small, E_small, E)


def _neighborhood(regs: np.ndarray) -> float:
    return float(estimate_cardinalities(regs).sum())


def _hyperanf_broadcast(spark, verts: np.ndarray, assigned: DataFrame, n_steps: int):
    """Packed-block raw-RDD executor (see components._cc_broadcast).  Scatter
    reads ONLY the immutable broadcast matrix (no intra-superstep propagation)
    so registers at step t are exactly the distance-<=t max-merge."""
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
    regs = init_registers(verts)
    history = [_neighborhood(regs)]
    info = {"iterations": 0, "converged": False, "mode": "broadcast"}
    bc = None
    packed = None
    blocks = None
    try:
        blocks = _encoded_blocks_df(spark, assigned, bc_verts, dt)
        m = _blocks_edge_count(blocks, dt)
        if m <= EDGES_PER_TASK and n_steps > 1:
            # DRIVER-FUSED loop (the pagerank/CC driver-loop contract),
            # SYNCHRONOUS variant: each step reads only the previous step's
            # registers (the distance-<=t contract above), exactly like the
            # broadcast-per-step path, so the whole n_steps loop runs on
            # the driver over the collected block rows — zero Spark jobs
            # in the loop, identical register sequence.
            blocks_l = _collect_block_rows(blocks, dt)
            cur = regs.copy()
            converged = False
            for _ in range(n_steps):
                out = cur.copy()
                for s, d in blocks_l:
                    np.maximum.at(out, d, cur[s])
                    np.maximum.at(out, s, cur[d])
                if (out == cur).all():
                    converged = True
                    break
                cur = out
                info["iterations"] += 1
                history.append(_neighborhood(cur))
            regs = cur
            info["converged"] = converged
            return history, info
        packed = _blocks_rdd(blocks, m)
        for _t in range(n_steps):
            bc = sc.broadcast(regs)

            def scatter(part_iter, _bc=bc, _dt=dt):
                c = _bc.value
                out = None
                for s_b, d_b in part_iter:
                    if out is None:
                        out = c.copy()
                    s = np.frombuffer(s_b, dtype=_dt)
                    d = np.frombuffer(d_b, dtype=_dt)
                    np.maximum.at(out, d, c[s])
                    np.maximum.at(out, s, c[d])
                if out is not None:
                    imp = np.flatnonzero((out > c).any(axis=1))
                    if len(imp):
                        yield (imp.astype(_dt).tobytes(), out[imp].tobytes())

            got = packed.mapPartitions(scatter).collect()
            bc.destroy()
            bc = None
            if not got:
                info["converged"] = True
                break
            new = regs.copy()
            for vid_b, reg_b in got:
                vid = np.frombuffer(vid_b, dtype=dt)
                rr = np.frombuffer(reg_b, dtype=np.uint8).reshape(-1, _M)
                np.maximum.at(new, vid, rr)
            info["iterations"] += 1
            regs = new
            history.append(_neighborhood(regs))
    finally:
        if bc is not None:
            bc.destroy()
        if packed is not None:
            release(packed)
        if blocks is not None:
            release(blocks)
        bc_verts.destroy()
    return history, info


# type objects, not a DDL string: DDL parsing needs an active session and
# would break plain `import` of this module
from pyspark.sql.types import ArrayType, IntegerType  # noqa: E402


@F.pandas_udf(ArrayType(IntegerType()))
def _init_regs_udf(vertex: pd.Series) -> pd.Series:
    regs = init_registers(vertex.to_numpy(np.int64))
    return pd.Series(list(regs.astype(np.int32)))


# --- packed register layout (7 byte-lanes per long, 10 longs) --------------
# 7 lanes (not 8) keeps every intermediate POSITIVE: the SWAR guard bits top
# out at bit 55, so (a|G) - b can never wrap int64 — required because Spark 4
# runs ANSI mode (long overflow throws) and the sign bit is untouchable.
# Payload: 10 longs ~ 80B/row vs ~270B for array<int>(64).
_N_LONGS = 10
_LANES = 7  # byte lanes per long; register i -> long i//7, lane i%7
_GUARDS = 0x0080808080808080  # guard bit per lane (bits 7,15,...,55)


def _pack_expr(regs_col):
    """array<int>(64) -> array<bigint>(10): lane value in the LOW 7 bits of
    each byte (register values <= 59 < 127; guard bit 0x80 stays clear);
    lanes past register 63 stay zero."""
    return F.array(*[
        sum(
            (F.shiftleft(regs_col[j * _LANES + i].cast("long"), 8 * i))
            for i in range(_LANES)
            if j * _LANES + i < _M
        )
        for j in range(_N_LONGS)
    ])


def _unpack_lane(pk_col, i: int):
    """register i from the packed array (JVM expression)."""
    return F.shiftrightunsigned(pk_col[i // _LANES], 8 * (i % _LANES)).bitwiseAND(
        F.lit(0x7F)
    )


def _swar_max(a, b):
    """Per-byte-lane max of two packed longs — the classic guard-bit SWAR:
    t = ((a|G) - b) & G has the guard bit set exactly where a_lane >= b_lane
    (no inter-byte borrow: (0x80 + a) - b stays in [1, 255] per byte); the
    full-byte winner mask is (t - (t >>> 7)) | t."""
    G = F.lit(_GUARDS)
    t = (a.bitwiseOR(G) - b).bitwiseAND(G)
    full = (t - F.shiftrightunsigned(t, 7)).bitwiseOR(t)
    return a.bitwiseAND(full).bitwiseOR(b.bitwiseAND(full.bitwiseXOR(F.lit(-1))))


def _packed_merge_expr(list_col):
    """Reduce a collected list of packed register arrays to their lane-wise
    max — all bitwise JVM expressions, no Python."""
    zero = F.array(*[F.lit(0).cast("long") for _ in range(_N_LONGS)])
    return F.reduce(
        list_col, zero, lambda acc, x: F.zip_with(acc, x, _swar_max)
    )


def _packed_estimate_sum_expr():
    """Sum-over-vertices HLL estimate straight off the packed longs
    (identical formula to estimate_cardinalities)."""
    lanes = [_unpack_lane(F.col("pk"), i).cast("double") for i in range(_M)]
    s = sum(F.pow(F.lit(2.0), -r) for r in lanes)
    V = sum(F.when(r == 0.0, 1).otherwise(0) for r in lanes)
    E = F.lit(_ALPHA * _M * _M) / s
    est = F.when(
        (E <= F.lit(2.5 * _M)) & (V > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / V.cast("double")),
    ).otherwise(E)
    return F.sum(est).alias("nf")


def _hyperanf_shuffle_packed(spark, edges: DataFrame, n_steps: int, stop_early: bool):
    """Packed-state distributed path: state is (vertex, pk array<bigint>(10));
    each superstep unions neighbor packed rows both directions plus the state
    itself, then ONE groupBy(vertex) with collect_list + SWAR-reduce (module
    docstring: the uncombined ~80B packed rows are the smaller shuffle than
    64-int agg buffers on mostly-distinct-keys-per-task graphs)."""
    from ..sources.edges import vertices_of

    state = (
        vertices_of(edges)
        .select("vertex", _pack_expr(_init_regs_udf("vertex")).alias("pk"))
        .localCheckpoint(eager=True)
    )
    est_expr = _packed_estimate_sum_expr()
    history = [state.agg(est_expr).collect()[0][0]]
    info = {"iterations": 0, "converged": False, "mode": "shuffle_packed"}
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    try:
        for _t in range(n_steps):
            nb = (
                e.join(state.withColumnRenamed("vertex", "src"), "src")
                .select(F.col("dst").alias("vertex"), "pk")
                .unionAll(
                    e.join(state.withColumnRenamed("vertex", "dst"), "dst").select(
                        F.col("src").alias("vertex"), "pk"
                    )
                )
                .unionAll(state)
            )
            new_state = (
                nb.groupBy("vertex")
                .agg(F.collect_list("pk").alias("ps"))
                .select("vertex", _packed_merge_expr(F.col("ps")).alias("pk"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_state.join(state.withColumnRenamed("pk", "old"), "vertex")
                .where(F.col("pk") != F.col("old"))
                .count()
            )
            release(state)
            state = new_state
            info["iterations"] += 1
            if changed == 0:
                info["converged"] = True
                break
            history.append(state.agg(est_expr).collect()[0][0])
    finally:
        release(state)
        release(e)
    return history, info


def _hyperanf_shuffle(spark, edges: DataFrame, n_steps: int, stop_early: bool):
    """Fully distributed path: registers live in a (vertex, regs array<int>)
    DataFrame; each superstep is ONE shuffle — union of neighbor register rows
    in both directions plus the state itself, then a single groupBy(vertex)
    with 64 columnar MAX aggregations (all JVM, map-side combined).  State is
    localCheckpointed per superstep for lineage-free constant-size plans."""
    from ..sources.edges import vertices_of

    state = (
        vertices_of(edges)
        .select("vertex", _init_regs_udf("vertex").alias("regs"))
        .localCheckpoint(eager=True)
    )
    est_expr = _estimate_sum_expr()
    history = [state.agg(est_expr).collect()[0][0]]
    info = {"iterations": 0, "converged": False, "mode": "shuffle"}
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    maxes = [F.max(F.col("regs")[i]).alias(f"r{i}") for i in range(_M)]
    try:
        for _t in range(n_steps):
            nb = (
                e.join(state.withColumnRenamed("vertex", "src"), "src")
                .select(F.col("dst").alias("vertex"), "regs")
                .unionAll(
                    e.join(state.withColumnRenamed("vertex", "dst"), "dst").select(
                        F.col("src").alias("vertex"), "regs"
                    )
                )
                .unionAll(state)
            )
            new_state = (
                nb.groupBy("vertex")
                .agg(*maxes)
                .select("vertex", F.array(*[F.col(f"r{i}") for i in range(_M)]).alias("regs"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new_state.join(state.withColumnRenamed("regs", "old"), "vertex")
                .where(F.col("regs") != F.col("old"))
                .count()
            )
            release(state)
            state = new_state
            info["iterations"] += 1
            if changed == 0:
                # register fixpoint: later sweeps cannot change anything, so
                # stop in BOTH modes — the caller pads the constant tail when
                # a fixed-shape history was requested
                info["converged"] = True
                break
            history.append(state.agg(est_expr).collect()[0][0])
    finally:
        release(state)
        release(e)
    return history, info


def hyperanf_register_moments(edges: DataFrame, n_steps: int = 3) -> DataFrame:
    """(t, vertex, reg_sum, zero_regs) for t = 0..n_steps — INTEGER moments of
    the per-vertex register arrays after each superstep.

    This is the cross-engine oracle surface (ADVICE r3): the float HLL
    estimate's small-range branch (E <= 2.5m) is discontinuous, so a last-ulp
    difference in per-engine summation order near the branch boundary could
    flip the estimator formula and flake the oracle.  The registers
    themselves are bit-identical by construction (splitmix64 + max-merge, any
    order), so their integer sum and zero-count per vertex are exact in both
    engines; the float estimate is computed on the Spark side only
    (``hyperanf``, rows-only driver check).

    Runs the JVM shuffle path with NO early stop (fixed output shape)."""
    from functools import reduce

    from ..sources.edges import vertices_of

    state = (
        vertices_of(edges)
        .select("vertex", _init_regs_udf("vertex").alias("regs"))
        .localCheckpoint(eager=True)
    )
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    maxes = [F.max(F.col("regs")[i]).alias(f"r{i}") for i in range(_M)]

    def moments(st: DataFrame, t: int) -> DataFrame:
        reg_sum = F.aggregate(
            "regs", F.lit(0).cast("long"), lambda a, r: a + r.cast("long")
        )
        zeros = F.aggregate(
            "regs", F.lit(0).cast("long"),
            lambda a, r: a + F.when(r == 0, F.lit(1)).otherwise(F.lit(0)).cast("long"),
        )
        return st.select(
            F.lit(t).cast("long").alias("t"),
            "vertex",
            reg_sum.alias("reg_sum"),
            zeros.alias("zero_regs"),
        )

    # all n_steps+1 states stay persisted until the union is materialized
    # (the per-state moments selects are lazy over the checkpointed blocks)
    states = [state]
    try:
        for _t in range(n_steps):
            nb = (
                e.join(state.withColumnRenamed("vertex", "src"), "src")
                .select(F.col("dst").alias("vertex"), "regs")
                .unionAll(
                    e.join(state.withColumnRenamed("vertex", "dst"), "dst").select(
                        F.col("src").alias("vertex"), "regs"
                    )
                )
                .unionAll(state)
            )
            state = (
                nb.groupBy("vertex")
                .agg(*maxes)
                .select("vertex", F.array(*[F.col(f"r{i}") for i in range(_M)]).alias("regs"))
                .localCheckpoint(eager=True)
            )
            states.append(state)
        out = reduce(
            DataFrame.unionAll, [moments(st, t) for t, st in enumerate(states)]
        ).localCheckpoint(eager=True)
        return out
    finally:
        for st in states:
            release(st)
        release(e)


def _estimate_sum_expr():
    """Sum-over-vertices HLL estimate as a pure JVM expression (identical
    formula to estimate_cardinalities)."""
    s = F.aggregate(
        "regs", F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double"))
    )
    V = F.aggregate(
        "regs", F.lit(0), lambda acc, r: acc + F.when(r == 0, 1).otherwise(0)
    )
    E = F.lit(_ALPHA * _M * _M) / s
    est = F.when(
        (E <= F.lit(2.5 * _M)) & (V > 0),
        F.lit(float(_M)) * F.log(F.lit(float(_M)) / V.cast("double")),
    ).otherwise(E)
    return F.sum(est).alias("nf")


def hyperanf(
    edges: DataFrame,
    assigned: DataFrame | None = None,
    n_steps: int = 32,
    stop_early: bool = True,
    broadcast_threshold: int = 2_000_000,
    packed: bool = True,
) -> tuple[DataFrame, dict]:
    """Approximate neighborhood function N(t) for t = 0..n_steps.

    Returns ((t int, neighborhood double) DataFrame, info) where info carries
    iterations / converged / mode / effective_diameter_90 (smallest t with
    N(t) >= 0.9 * N(last), linearly interpolated — the standard HyperANF
    effective-diameter readout).

    stop_early=False forces exactly n_steps supersteps (fixed-shape output for
    the cross-engine oracle, like pagerank's fixed-iteration variant); with
    stop_early=True the loop ends at the register fixpoint, i.e. once every
    vertex's sketch covers its whole component.
    """
    from ..sources.edges import vertices_of

    spark = edges.sparkSession
    # one distinct-vertex job serves both the threshold decision and the
    # broadcast path's id collect (it was two full union+distinct shuffles);
    # persist: the count below materializes the cache (one job, not two)
    verts_df = vertices_of(edges).persist()
    try:
        n = verts_df.count()
        if n == 0:
            out = spark.createDataFrame(pd.DataFrame({"t": [0], "neighborhood": [0.0]}))
            return out, {"iterations": 0, "converged": True, "mode": "empty",
                         "effective_diameter_90": 0.0}
        if assigned is not None and n <= broadcast_threshold:
            verts = np.sort(verts_df.toPandas()["vertex"].to_numpy(np.int64))
            history, info = _hyperanf_broadcast(spark, verts, assigned, n_steps)
        elif packed:
            history, info = _hyperanf_shuffle_packed(spark, edges, n_steps, stop_early)
        else:
            history, info = _hyperanf_shuffle(spark, edges, n_steps, stop_early)
    finally:
        release(verts_df)
    if not stop_early:
        history = history + [history[-1]] * (n_steps + 1 - len(history))
    n_inf = history[-1]
    target = 0.9 * n_inf
    eff = float(len(history) - 1)
    for t in range(len(history)):
        if history[t] >= target:
            if t == 0 or history[t] == history[t - 1]:
                eff = float(t)
            else:
                eff = (t - 1) + (target - history[t - 1]) / (history[t] - history[t - 1])
            break
    info["effective_diameter_90"] = eff
    out = spark.createDataFrame(
        pd.DataFrame({"t": np.arange(len(history), dtype=np.int64),
                      "neighborhood": np.asarray(history, dtype=np.float64)})
    )
    return out, info
