"""PageRank over a vertex-cut partitioned undirected edge table.

Semantics (matching the NumPy oracle in tests/oracles.py, and the paper's
PowerGraph PR over FSM partitions, full.pdf §5.4): undirected graph, each edge
(u,v) sends rank(u)/deg(u) to v and rank(v)/deg(v) to u per superstep;
r' = (1-d)/n + d * gathered;  damping d = 0.85; converged when
max|r' - r| <= tol.

Two execution modes:
- mode="gas":  the north-star path.  Below ``broadcast_threshold`` vertices a
  packed-block raw-RDD executor runs (combine="rdd"/"driver"/"shuffle");
  above it the distributed superstep runs with combine=
  * "jvm" (default): contribs join the pre-partitioned doubled edge relation
    and gather with groupBy(vertex).sum — three JVM operators per superstep
    (the kcore.py::_coreness_shuffle pattern), zero Python in the loop, one
    map-side-combined shuffle per superstep (the contrib join is co-located).
  * "mirror": PowerGraph-volume pure-JVM superstep — exchanges carry
    2*RF*n rows (mirror contribs in, per-bucket partials out), the
    RF-governed cost the FSM partitioner minimizes, at the price of two
    exchanges + within-bucket joins; A/B'd vs "jvm" in BENCH/BASELINE.md
    (shuffle-bound clusters want this one; the sandbox's CPU-bound local
    mode favors "jvm").
  * "cogroup": per-bucket CSR scatter inside cogroup().applyInPandas (Arrow
    blocks), mirror-rank shuffle O(RF*n) — the PowerGraph-literal kernel,
    kept as the A/B floor (BENCH/BASELINE.md records the comparison).
- mode="join": pure-DataFrame fallback (edges JOIN ranks on both endpoints,
  groupBy(vertex).sum) — lets Catalyst/AQE pick the physical plan; used to
  cross-check the GAS kernel and as the no-partitioner baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

from ..sources.edges import degrees as degrees_of
from .gas import at_boundary, truncate

DAMPING = 0.85


def _scatter_kernel(key: tuple, state: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket CSR gather-scatter: emit (vertex, partial rank mass).
    state carries precomputed contrib = rank/degree (slim mirror rows)."""
    if len(edges) == 0 or len(state) == 0:
        return pd.DataFrame({"vertex": np.empty(0, np.int64), "partial": np.empty(0, np.float64)})
    verts = state["vertex"].to_numpy(np.int64)
    order = np.argsort(verts, kind="stable")
    verts = verts[order]
    contrib = state["contrib"].to_numpy(np.float64)[order]
    s = np.searchsorted(verts, edges["src"].to_numpy(np.int64))
    d = np.searchsorted(verts, edges["dst"].to_numpy(np.int64))
    partial = np.bincount(d, weights=contrib[s], minlength=len(verts))
    partial += np.bincount(s, weights=contrib[d], minlength=len(verts))
    return pd.DataFrame({"vertex": verts, "partial": partial})


EDGES_PER_TASK = 750_000  # packed-executor scatter-task sizing (see below)


def _encode_pack_fn(bc_verts, idx_dtype):
    """The per-shuffle-partition dense encoder shared by every packed-block
    build: all batches of a partition concatenate into ONE (s, d) block row —
    block boundaries therefore equal shuffle-partition boundaries, which
    every consumer below preserves (accumulation order is part of the
    float-exactness contract of the superstep loops)."""
    import numpy as _np
    import pandas as _pd

    def encode_pack(batches):
        vv = bc_verts.value
        ss, dd = [], []
        for pdf in batches:
            ss.append(_np.searchsorted(vv, pdf["src"].to_numpy(_np.int64)).astype(idx_dtype))
            dd.append(_np.searchsorted(vv, pdf["dst"].to_numpy(_np.int64)).astype(idx_dtype))
        if ss:
            s = _np.concatenate(ss) if len(ss) > 1 else ss[0]
            d = _np.concatenate(dd) if len(dd) > 1 else dd[0]
            yield _pd.DataFrame({"s": [s.tobytes()], "d": [d.tobytes()]})

    return encode_pack


def _encoded_blocks_df(spark, assigned: DataFrame, bc_verts, idx_dtype) -> DataFrame:
    """The packed (s, d) binary edge blocks as a lineage-free DataFrame —
    one row per shuffle partition, localCheckpoint'ed in ONE parallel job.
    This is the cheap static input for the FUSED single-task loop consumers
    (coalesce(1).mapInPandas): the blocks never cross the JVM->Python row
    pickler (the ~0.2 s/partition Pyrolite chain the raw-RDD build pays),
    only Arrow."""
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return (
        assigned.select("bucket", "src", "dst")
        .repartition(shuffle_n, "bucket")
        .mapInPandas(_encode_pack_fn(bc_verts, idx_dtype), schema="s binary, d binary")
        .localCheckpoint(eager=True)
    )


def _blocks_edge_count(blocks: DataFrame, idx_dtype) -> int:
    """Total packed edges — one tiny aggregate over the <= shuffle_n block
    rows (bytes / index width)."""
    import numpy as _np

    row = blocks.agg(F.sum(F.length("s")).alias("b")).collect()[0]
    return int(row["b"] or 0) // _np.dtype(idx_dtype).itemsize


def _iter_block_rows(batches, idx_dtype):
    """Decode an Arrow batch stream of (s, d) binary block rows into numpy
    index pairs, preserving row (= original shuffle partition) order."""
    import numpy as _np

    out = []
    for pdf in batches:
        for s_b, d_b in zip(pdf["s"], pdf["d"]):
            out.append(
                (_np.frombuffer(s_b, dtype=idx_dtype), _np.frombuffer(d_b, dtype=idx_dtype))
            )
    return out


def _collect_block_rows(blocks: DataFrame, idx_dtype):
    """Pull (s, d) block rows to the driver.  collect() returns rows in
    partition order, so the block sequence is identical to what
    _iter_block_rows sees in a coalesce(1) consumer — the accumulation
    order (part of the float-exactness contract) is preserved.  Only used
    under the EDGES_PER_TASK gate, where the payload is bounded at ~8
    bytes/edge (a few MB)."""
    import numpy as _np

    return [
        (
            _np.frombuffer(bytes(r["s"]), dtype=idx_dtype),
            _np.frombuffer(bytes(r["d"]), dtype=idx_dtype),
        )
        for r in blocks.collect()
    ]


def _collect_encoded_blocks(spark, assigned: DataFrame, bc_verts, idx_dtype):
    """ONE job: encode + collect, no intermediate checkpoint.  For fused
    sub-threshold consumers the blocks are read exactly once, so
    materializing them in the block store first (then re-reading through a
    second single-task job + state broadcast) was pure fixed overhead —
    the loop itself runs on the driver over the same block sequence."""
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = (
        assigned.select("bucket", "src", "dst")
        .repartition(shuffle_n, "bucket")
        .mapInPandas(_encode_pack_fn(bc_verts, idx_dtype), schema="s binary, d binary")
    )
    return _collect_block_rows(df, idx_dtype)


def _blocks_rdd(blocks: DataFrame, m: int, edges_per_task: int = EDGES_PER_TASK):
    """Raw-RDD loop input built from an already-checkpointed block DataFrame
    (the multi-task regime of executors that could not know m up front):
    persist the un-coalesced python RDD first — parallel JVM->Python chains —
    then coalesce to the fat scatter tasks (see _pack_edge_blocks on why this
    order matters)."""
    import math

    rdd = blocks.rdd.map(lambda r: (bytes(r[0]), bytes(r[1]))).persist()
    rdd.count()
    n_parts = rdd.getNumPartitions()
    n_tasks = min(n_parts, max(1, math.ceil(m / edges_per_task)))
    if n_tasks < n_parts:
        fat = rdd.coalesce(n_tasks).persist()
        fat.count()
        release(rdd)
        rdd = fat
    return rdd


def _pack_edge_blocks(spark, assigned: DataFrame, bc_verts, idx_dtype,
                      edges_per_task: int = EDGES_PER_TASK):
    """Dense-encode the partition-aligned edge blocks ONCE into a pickled-numpy
    RDD: one (s_bytes, d_bytes) pair per partition, persisted in the JVM block
    store.  This is the static input of the raw-RDD superstep loop — after
    this single SQL job the loop never touches Catalyst/Arrow again.

    Task sizing: on this class of iterative job the dominant cost is the fixed
    per-job/per-task scheduling floor (profiled ~0.25 s/job + ~7 ms/python
    task in-sandbox), not the vectorized scatter itself — so the packed blocks
    are coalesced (no shuffle: whole blocks move, never edges) to
    ``ceil(m / edges_per_task)`` scatter tasks, keeping every task fat enough
    that scheduling overhead amortizes while still scaling out with m.

    (Order matters: the un-coalesced RDD is persisted and materialized FIRST —
    32 parallel JVM->Python chains — and only then coalesced; coalescing
    before the persist serializes those ~0.2 s/partition chains into one
    task, the r6-profiled 4-5 s trap.)"""
    import math

    import numpy as _np

    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    packed = (
        assigned.select("bucket", "src", "dst")
        .repartition(shuffle_n, "bucket")
        .mapInPandas(_encode_pack_fn(bc_verts, idx_dtype), schema="s binary, d binary")
    )
    rdd = packed.rdd.map(lambda r: (bytes(r[0]), bytes(r[1]))).persist()
    itemsize = _np.dtype(idx_dtype).itemsize
    m = rdd.map(lambda t: len(t[0]) // itemsize).sum()  # materializes the pack
    n_tasks = min(shuffle_n, max(1, math.ceil(m / edges_per_task)))
    if n_tasks < shuffle_n:
        fat = rdd.coalesce(n_tasks).persist()
        fat.count()
        release(rdd)
        rdd = fat
    return rdd


def _pagerank_gas_rdd(
    spark,
    deg,
    n: int,
    assigned: DataFrame,
    tol: float,
    max_iter: int,
    damping: float,
    check_every: int,
    ckpt,
    start_it: int,
    init_rank: np.ndarray | None,
    m_edges_hint: int | None = None,
) -> tuple[DataFrame, dict]:
    """Raw-RDD superstep executor for the sub-threshold regime (n bounded by
    ``broadcast_threshold``) — the round-3 answer to the profiled >=1.1 s
    job+collect floor of the SQL/mapInPandas path.

    One-time setup: edge blocks are dense-encoded and packed as ONE pickled
    numpy (s, d) pair per partition, persisted in the JVM cache (never
    collected to the driver — m stays distributed).  Each superstep is then a
    SINGLE raw-RDD job: ship the contrib vector via ``sc.broadcast`` (n
    doubles), each task unpickles its ~MBs block (a memcpy), scatters with two
    ``bincount``s, and returns only its nonzero partials (~|V_b| rows, the
    RF-governed volume — same as the PowerGraph mirror-update cost,
    full.pdf §5.2.2).  The driver combines with one bincount and checks
    convergence for free — no Catalyst planning, no Arrow batch machinery, no
    separate delta job.  Above the threshold the caller uses the fully
    distributed cogroup path; this executor is the small-state accelerator,
    exactly like the reference runs single-machine C++ at these sizes."""
    import time as _time

    deg_pdf = deg.toPandas().sort_values("vertex")
    verts = deg_pdf["vertex"].to_numpy(np.int64)
    degv = deg_pdf["degree"].to_numpy(np.float64)
    sc = spark.sparkContext
    bc_verts = sc.broadcast(verts)
    idx_dtype = np.int32 if n < 2**31 else np.int64

    base = (1.0 - damping) / n
    rank = np.full(n, 1.0 / n) if init_rank is None else init_rank
    info = {"iterations": start_it, "converged": False, "n": n}
    m_edges = None
    per_partition = None
    if ckpt is not None:
        from ..operators.stats import bucket_sizes

        m_edges = assigned.count()
        per_partition = bucket_sizes(assigned).persist()

    def state_df():
        pdf = pd.DataFrame({"vertex": verts, "rank": rank})
        return spark.createDataFrame(pdf)

    nn = n
    dt = idx_dtype
    step_times: list[float] = []
    bc = None
    packed_rdd = None
    blocks = None
    # DRIVER FUSION (guide §1.2/§2.4: remove per-pass overhead): when the
    # pack would coalesce to one scatter task anyway, every local superstep
    # over the complete edge set IS the global superstep, bit for bit —
    # identical per-block bincount/accumulation order, identical apply
    # arithmetic — so the blocks are collected in one job (a few MB under
    # the gate) and the whole loop runs on the driver, skipping the
    # per-superstep job+broadcast+collect floor, the block-store
    # checkpoint, AND the raw-RDD build's JVM->Python row pickling.
    # Multi-task packs keep the per-step raw-RDD jobs (a global gather is
    # fundamentally required there), and ckpt runs keep them too (boundary
    # states must materialize).
    fused_single_task = (
        ckpt is None
        and max_iter > start_it
        and m_edges_hint is not None
        and m_edges_hint <= EDGES_PER_TASK
    )
    try:
        if fused_single_task:
            # DRIVER-FUSED loop (r6 second cut): one encode+collect job, then
            # the whole superstep loop runs on the driver over the identical
            # block sequence — same per-block bincount order, same apply
            # arithmetic, bit-for-bit the single-task kernel's results,
            # without the block-store checkpoint, the coalesce(1) Python
            # task, or the initial-state broadcast.  Valid exactly where the
            # single-task fusion was: the complete edge set fits one task's
            # budget (m <= EDGES_PER_TASK), so the collected payload is a
            # few MB and every local superstep equals the global superstep.
            blocks_l = _collect_encoded_blocks(spark, assigned, bc_verts, idx_dtype)
            loop_t0 = _time.monotonic()
            steps = max_iter - start_it
            r = rank.copy()
            last_delta = float("nan")
            converged = False
            for _ in range(steps):
                t0 = _time.monotonic()
                c = r / degv
                g = np.zeros(nn)
                for s, d in blocks_l:
                    p = np.bincount(d, weights=c[s], minlength=nn)
                    p += np.bincount(s, weights=c[d], minlength=nn)
                    g += p
                new_r = base + damping * g
                last_delta = float(np.max(np.abs(new_r - r))) if nn else 0.0
                r = new_r
                step_times.append(_time.monotonic() - t0)
                if tol > 0 and last_delta <= tol:
                    converged = True
                    break
            info["superstep_seconds"] = _time.monotonic() - loop_t0
            rank = r
            info["iterations"] = start_it + len(step_times)
            if converged:
                info["converged"] = True
                info["delta"] = last_delta
            return state_df(), info
        packed_rdd = _pack_edge_blocks(spark, assigned, bc_verts, idx_dtype)
        block_t0 = _time.monotonic()
        loop_t0 = _time.monotonic()
        for it in range(start_it, max_iter):
            step_t0 = _time.monotonic()
            contrib = rank / degv
            bc = sc.broadcast(contrib)

            def scatter(part_iter, _bc=bc, _n=nn, _dt=dt):
                c = _bc.value
                partial = None
                for s_b, d_b in part_iter:
                    s = np.frombuffer(s_b, dtype=_dt)
                    d = np.frombuffer(d_b, dtype=_dt)
                    p = np.bincount(d, weights=c[s], minlength=_n)
                    p += np.bincount(s, weights=c[d], minlength=_n)
                    partial = p if partial is None else partial + p
                if partial is not None:
                    nz = np.flatnonzero(partial)
                    yield (nz.astype(_dt).tobytes(), partial[nz].tobytes())

            g = np.zeros(n)
            for nz_b, val_b in packed_rdd.mapPartitions(scatter).collect():
                nz = np.frombuffer(nz_b, dtype=dt)
                g[nz] += np.frombuffer(val_b, dtype=np.float64)
            bc.destroy()
            bc = None
            new_rank = base + damping * g
            delta = float(np.max(np.abs(new_rank - rank)))
            rank = new_rank
            info["iterations"] = it + 1
            step_times.append(_time.monotonic() - step_t0)
            if at_boundary(it, check_every) or it == max_iter - 1 or (tol > 0 and delta <= tol):
                if ckpt is not None:
                    elapsed = max(_time.monotonic() - block_t0, 1e-9)
                    steps = (it % check_every) + 1
                    ckpt.save_superstep(
                        it, state_df(), per_partition, delta, (m_edges or 0) * steps / elapsed
                    )
                    block_t0 = _time.monotonic()
            if tol > 0 and delta <= tol:
                info["converged"] = True
                info["delta"] = delta
                break
    finally:
        # loop-only wall clock (excludes degree/encode/pack setup): the honest
        # denominator for edges/sec/superstep at convergence-run step counts.
        # The per-step minimum backs the interleaved-minima protocol for this
        # VM's 2-40x spikes (BENCH/BASELINE.md).
        if packed_rdd is not None:
            info["superstep_seconds"] = _time.monotonic() - loop_t0
            release(packed_rdd)
        if blocks is not None:
            release(blocks)
        if step_times:
            info["superstep_seconds_min"] = min(step_times)
        if bc is not None:
            bc.destroy()
        bc_verts.destroy()
        if per_partition is not None:
            release(per_partition)
    return state_df(), info


def _pagerank_gas_broadcast(
    spark,
    deg,
    n: int,
    assigned: DataFrame,
    tol: float,
    max_iter: int,
    damping: float,
    check_every: int,
    ckpt,
    start_it: int,
    init_rank: np.ndarray | None,
    combine: str = "auto",
) -> tuple[DataFrame, dict]:
    """PowerGraph-style broadcast execution under the state-size threshold:
    edge blocks are dense-encoded ONCE and cached partition-aligned; each
    superstep ships only the contrib vector via sc.broadcast, scatters over
    the static Arrow blocks (mapInPandas, zero input shuffle), and combines
    with one groupBy — 2 stages per superstep.  The apply step runs on the
    driver in NumPy (n is bounded by the broadcast threshold by definition);
    beyond the threshold the caller uses the fully-distributed path."""
    import time as _time

    from pyspark.sql import functions as F  # local alias for clarity

    deg_pdf = deg.toPandas().sort_values("vertex")
    verts = deg_pdf["vertex"].to_numpy(np.int64)
    degv = deg_pdf["degree"].to_numpy(np.float64)
    bc_verts = spark.sparkContext.broadcast(verts)

    def encode(batches):
        vv = bc_verts.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "s": np.searchsorted(vv, pdf["src"].to_numpy(np.int64)).astype(np.int64),
                    "d": np.searchsorted(vv, pdf["dst"].to_numpy(np.int64)).astype(np.int64),
                }
            )

    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    enc = (
        assigned.select("bucket", "src", "dst")
        .repartition(shuffle_n, "bucket")
        .mapInPandas(encode, schema="s long, d long")
        .localCheckpoint(eager=True)
    )

    # AQE re-plans every query stage (~100-200 ms each); in a fixed-shape
    # superstep loop that adaptivity buys nothing — turn it off for the loop
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    base = (1.0 - damping) / n
    rank = np.full(n, 1.0 / n) if init_rank is None else init_rank
    # below ~1M vertices the collected per-partition partials (RF*n rows)
    # are cheaper than a full reduce stage + n-row collect
    if combine == "auto":
        combine = "driver" if n <= 1_000_000 else "shuffle"
    driver_combine = combine == "driver"
    info = {"iterations": start_it, "converged": False, "n": n}
    m_edges = None
    per_partition = None
    if ckpt is not None:
        from ..operators.stats import bucket_sizes

        m_edges = assigned.count()
        per_partition = bucket_sizes(assigned).persist()

    def state_df():
        pdf = pd.DataFrame({"vertex": verts, "rank": rank})
        return spark.createDataFrame(pdf)

    block_t0 = _time.monotonic()
    nn = n
    bc = None
    try:
        for it in range(start_it, max_iter):
            contrib = rank / degv
            bc = spark.sparkContext.broadcast(contrib)

            def scatter(batches, _bc=bc, _n=nn):
                c = _bc.value
                # accumulate across ALL batches of the partition and emit ONCE:
                # per-batch emission would produce ~one row per edge instead of
                # one row per locally-touched vertex (the whole point of the
                # partition-aligned layout is that this is ~|V_b| rows)
                partial = np.zeros(_n, dtype=np.float64)
                touched = False
                for pdf in batches:
                    s = pdf["s"].to_numpy(np.int64)
                    d = pdf["d"].to_numpy(np.int64)
                    # bincount is ~5-10x faster than np.add.at for scatter-add
                    partial += np.bincount(d, weights=c[s], minlength=_n)
                    partial += np.bincount(s, weights=c[d], minlength=_n)
                    touched = True
                if touched:
                    nz = np.flatnonzero(partial)
                    yield pd.DataFrame({"vid": nz, "partial": partial[nz]})

            if driver_combine:
                # ONE stage per superstep: each partition's dense-accumulated
                # partials (~|V_b| rows) are collected and combined with a single
                # bincount — no reduce stage, no second round of task scheduling.
                # Collect volume is RF*n rows; chosen only when n is small enough
                # that this beats the groupBy shuffle (sandbox/bench regime).
                partial_pdf = enc.mapInPandas(
                    scatter, schema="vid long, partial double"
                ).toPandas()
                g = np.bincount(
                    partial_pdf["vid"].to_numpy(np.int64),
                    weights=partial_pdf["partial"].to_numpy(np.float64),
                    minlength=n,
                )
            else:
                gathered = (
                    enc.mapInPandas(scatter, schema="vid long, partial double")
                    .groupBy("vid")
                    .agg(F.sum("partial").alias("g"))
                    .toPandas()
                )
                g = np.zeros(n)
                g[gathered["vid"].to_numpy(np.int64)] = gathered["g"].to_numpy(np.float64)
            bc.destroy()
            bc = None
            new_rank = base + damping * g
            delta = float(np.max(np.abs(new_rank - rank)))
            rank = new_rank
            info["iterations"] = it + 1
            if at_boundary(it, check_every) or it == max_iter - 1 or (tol > 0 and delta <= tol):
                if ckpt is not None:
                    elapsed = max(_time.monotonic() - block_t0, 1e-9)
                    steps = (it % check_every) + 1
                    ckpt.save_superstep(
                        it, state_df(), per_partition, delta, (m_edges or 0) * steps / elapsed
                    )
                    block_t0 = _time.monotonic()
            if tol > 0 and delta <= tol:
                info["converged"] = True
                info["delta"] = delta
                break
    finally:
        if bc is not None:
            bc.destroy()
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    return state_df(), info


def pagerank(
    edges: DataFrame,
    assigned: DataFrame | None = None,
    replicas: DataFrame | None = None,
    tol: float = 1e-8,
    max_iter: int = 100,
    damping: float = DAMPING,
    mode: str = "gas",
    check_every: int = 5,
    ckpt=None,
    resume: bool = False,
    broadcast_threshold: int = 5_000_000,
    combine: str = "auto",
) -> tuple[DataFrame, dict]:
    """Returns (ranks DataFrame (vertex, rank), run info dict).

    For mode="gas", pass ``assigned`` (src, dst, bucket); replicas is derived
    if not given.  Ranks sum to ~1 (uniform init 1/n).

    ckpt: optional CheckpointManager — per-boundary state + F8 metric rows are
    written and the run resumes from the last complete superstep when
    resume=True.
    """
    import time as _time

    spark = edges.sparkSession
    # persist (not localCheckpoint): the n/m aggregate right below is the
    # materializing job, so the degree table costs ONE job instead of an
    # eager-checkpoint job plus the aggregate; every later consumer (the
    # toPandas of the dense path, the jvm static build) reads the cache
    deg = degrees_of(edges).persist()
    # one job for both n and m (sum of degrees = 2m) — m feeds the packed
    # executor's coalesce decision so the pack materializes in one job
    deg_row = deg.agg(
        F.count(F.lit(1)).alias("n"), F.sum("degree").alias("s")
    ).collect()[0]
    n = int(deg_row["n"])
    m_edges_hint = int(deg_row["s"] or 0) // 2
    start_it = 0
    if ckpt is not None and resume and ckpt.latest_superstep() is not None:
        start_it = ckpt.latest_superstep() + 1
        state = (
            ckpt.load_state(spark, start_it - 1)
            .join(deg, "vertex")
            .select("vertex", "degree", "rank")
            .localCheckpoint(eager=True)
        )
    else:
        state = deg.select(
            "vertex", "degree", (F.lit(1.0) / F.lit(float(n))).alias("rank")
        ).localCheckpoint(eager=True)

    # broadcast the per-superstep vertex state when it's small enough; at
    # larger n fall back to the shuffle join (the PowerGraph mirror-update
    # cost, O(RF*n) rows) — this threshold is the only sandbox-vs-cluster knob.
    # Explicitly requesting a distributed combine ("jvm"/"cogroup") forces the
    # distributed superstep even under the threshold (A/B + scale testing).
    broadcast_state = n <= broadcast_threshold and combine not in ("jvm", "cogroup", "mirror")

    if mode == "gas" and broadcast_state:
        assert assigned is not None, "gas mode needs the partition assignment"
        init_rank = None
        if start_it > 0:
            pdf = state.select("vertex", "rank").toPandas().sort_values("vertex")
            init_rank = pdf["rank"].to_numpy(np.float64)
        release(state)
        try:
            if combine in ("auto", "rdd"):
                # default sub-threshold executor: raw-RDD static blocks, one
                # job per superstep, no Catalyst/Arrow in the loop (docstring)
                return _pagerank_gas_rdd(
                    spark, deg, n, assigned, tol, max_iter, damping, check_every,
                    ckpt, start_it, init_rank, m_edges_hint=m_edges_hint,
                )
            return _pagerank_gas_broadcast(
                spark, deg, n, assigned, tol, max_iter, damping, check_every,
                ckpt, start_it, init_rank, combine=combine,
            )
        finally:
            # both executors return driver-materialized results, so the
            # checkpointed degree table can be released here (it otherwise
            # accrues one n-row checkpoint per pagerank call)
            release(deg)

    und_jvm = None
    edges_by_bucket = None
    replicas_by_vertex = None
    if mode == "gas":
        # distributed default: the JVM-only superstep (A/B-measured faster
        # than the cogroup Python kernel at local[32] on the powerlaw
        # fixtures, BENCH/BASELINE.md r4) — zero Python/Arrow in the loop
        if combine in ("auto", "rdd", "driver", "shuffle"):
            combine = "jvm"
        shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if combine == "jvm":
            # static input: the doubled edge relation pre-partitioned by the
            # gather-join key and lineage-truncated — every superstep's
            # contrib join is then exchange-free on this side (contribs
            # arrive hash-partitioned on the same key from the previous
            # groupBy), leaving ONE map-side-combined shuffle per superstep.
            # deg_nb (the CONTRIBUTOR's degree) rides on the static relation
            # so the superstep needs neither a degree column in the state nor
            # the post-gather deg join (VERDICT r4 item 3): rank/deg_nb is
            # computed per edge row inside the same codegen stage — bitwise
            # the same division as before, just evaluated 2m times instead of
            # n (divisions are free next to the exchange), and the state
            # shuffled per superstep shrinks from (long,long,double) to
            # (long,double)
            deg_nb = deg.select(F.col("vertex").alias("nb"), F.col("degree").alias("deg_nb"))
            und_jvm = (
                edges.select(F.col("src").alias("vertex"), F.col("dst").alias("nb"))
                .unionAll(
                    edges.select(F.col("dst").alias("vertex"), F.col("src").alias("nb"))
                )
                # one-time static build: shuffle-hash (deg is the build
                # side), NOT broadcast — deg is n rows and n can be 10^9+
                .join(deg_nb.hint("shuffle_hash"), "nb")
                .select("vertex", "nb", "deg_nb")
                .repartition(shuffle_n, "nb")
                .localCheckpoint(eager=True)
            )
            # jvm state is (vertex, rank) only; partitioning hash(vertex) from
            # the degrees groupBy (or the resume join) survives the checkpoint
            fat_state = state
            state = state.select("vertex", "rank").localCheckpoint(eager=True)
            release(fat_state)
        elif combine == "mirror":
            # PowerGraph-volume JVM superstep: per-superstep exchanges carry
            # 2*RF*n rows (mirror contribs in, per-bucket partials out) — the
            # RF-governed cost the FSM partitioner minimizes — instead of the
            # 2m rows of combine="jvm".  Statics: the doubled edge relation
            # AND the replica relation both hash-partitioned by bucket; the
            # within-bucket joins/partial-aggs are exchange-free because
            # hash(bucket) satisfies clustering on (bucket, vertex).
            assert assigned is not None, "gas/mirror needs the partition assignment"
            from ..operators.stats import replica_sets

            und_jvm = (
                assigned.select("bucket", F.col("src").alias("v"), F.col("dst").alias("nb"))
                .unionAll(
                    assigned.select("bucket", F.col("dst").alias("v"), F.col("src").alias("nb"))
                )
                .repartition(shuffle_n, "bucket")
                .localCheckpoint(eager=True)
            )
            replicas_by_vertex = (
                replica_sets(assigned)
                .repartition(shuffle_n, "vertex")
                .localCheckpoint(eager=True)
            )
        else:
            assert assigned is not None, "gas/cogroup needs the partition assignment"
            if replicas is None:
                from ..operators.stats import replica_sets

                replicas = replica_sets(assigned)
            # localCheckpoint (NOT just persist): the static inputs carry the whole
            # partitioner lineage; keeping it makes every superstep's plan hundreds
            # of nodes deep and driver-side planning dominates wall clock.  A
            # lineage-free LogicalRDD keeps the per-superstep plan constant-size.
            # Pre-partitioning by the join/cogroup keys keeps the exchanges cheap.
            replicas = replicas.repartition("vertex").localCheckpoint(eager=True)
            # aliased key: replicas and edges share lineage (both derive from
            # `assigned`) and cogroup would see an ambiguous attribute otherwise
            edges_by_bucket = (
                assigned.select(F.col("bucket").alias("ebkt"), "src", "dst")
                .repartition(shuffle_n, "ebkt")
                .localCheckpoint(eager=True)
            )

    # fixed-shape loop: AQE re-planning per stage is pure overhead here
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    base = (1.0 - damping) / n
    info = {"iterations": start_it, "converged": False, "n": n}
    last_checkpoint = state  # state at the previous boundary (for block delta)
    m_edges = None
    per_partition = None
    if ckpt is not None and mode == "gas":
        from ..operators.stats import bucket_sizes

        m_edges = assigned.count()
        per_partition = bucket_sizes(assigned).persist()
    block_t0 = _time.monotonic()
    loop_t0 = _time.monotonic()  # loop-only clock (excludes static-input prep)
    try:
        for it in range(start_it, max_iter):
            if mode == "gas" and combine == "jvm":
                # two JVM operators: co-located join (und_jvm is static and
                # pre-partitioned on nb; ranks arrive hash-partitioned on the
                # same key), then ONE partial-aggregated groupBy shuffle —
                # rank/deg_nb happens inside the join's codegen stage, and no
                # degree join follows (deg_nb is static on the doubled edges)
                contrib_df = state.select(F.col("vertex").alias("nb"), "rank")
                gathered = (
                    und_jvm.join(contrib_df.hint("shuffle_hash"), "nb")
                    .groupBy("vertex")
                    .agg(F.sum(F.col("rank") / F.col("deg_nb")).alias("gathered"))
                )
            elif mode == "gas" and combine == "mirror":
                # (1) mirror contribs: replicas(vertex-partitioned) join the
                #     vertex-partitioned contribs — exchange-free join, then
                #     the ONE RF*n-row exchange into hash(bucket);
                # (2) within-bucket gather: join on (bucket, nb) against the
                #     static doubled edges + partial sum per (bucket, v) —
                #     both satisfied by hash(bucket), zero exchange;
                # (3) global combine: groupBy(v) over RF*n partial rows.
                contrib_df = state.select(
                    "vertex", (F.col("rank") / F.col("degree")).alias("c")
                )
                mirror = (
                    replicas_by_vertex.join(contrib_df.hint("shuffle_hash"), "vertex")
                    .select("bucket", F.col("vertex").alias("nb"), "c")
                    .repartition(shuffle_n, "bucket")
                )
                partials = (
                    und_jvm.join(mirror.hint("shuffle_hash"), ["bucket", "nb"])
                    .groupBy("bucket", "v")
                    .agg(F.sum("c").alias("p"))
                )
                gathered = (
                    partials.groupBy(F.col("v").alias("vertex"))
                    .agg(F.sum("p").alias("gathered"))
                )
            elif mode == "gas":
                # slim mirror payload: contrib = rank/degree is all the kernel needs
                contrib_df = state.select(
                    "vertex", (F.col("rank") / F.col("degree")).alias("contrib")
                )
                st = F.broadcast(contrib_df) if broadcast_state else contrib_df
                mirror = replicas.join(st, "vertex").select("bucket", "vertex", "contrib")
                partials = (
                    mirror.groupby("bucket")
                    .cogroup(edges_by_bucket.groupby("ebkt"))
                    .applyInPandas(_scatter_kernel, schema="vertex long, partial double")
                )
                gathered = partials.groupBy("vertex").agg(F.sum("partial").alias("gathered"))
            else:
                contrib = state.select("vertex", (F.col("rank") / F.col("degree")).alias("c"))
                if broadcast_state:
                    contrib = F.broadcast(contrib)
                out = edges.join(
                    contrib.withColumnRenamed("vertex", "src"), "src"
                ).select(F.col("dst").alias("vertex"), "c")
                back = edges.join(
                    contrib.withColumnRenamed("vertex", "dst"), "dst"
                ).select(F.col("src").alias("vertex"), "c")
                gathered = out.unionAll(back).groupBy("vertex").agg(F.sum("c").alias("gathered"))

            # inner join is lossless: every vertex has degree >= 1 (ids come from
            # the edge list) so each one receives a scatter row (possibly 0.0)
            if mode == "gas" and combine == "jvm":
                # no deg join: the gathered relation already covers every
                # vertex (degree >= 1 guarantees a contrib row per neighbor)
                new_state = gathered.select(
                    "vertex",
                    (F.lit(base) + F.lit(damping) * F.col("gathered")).alias("rank"),
                )
            else:
                new_state = gathered.join(
                    F.broadcast(deg) if broadcast_state else deg, "vertex"
                ).select(
                    "vertex",
                    "degree",
                    (F.lit(base) + F.lit(damping) * F.coalesce(F.col("gathered"), F.lit(0.0))).alias("rank"),
                )
            # lazy chain between boundaries: each check_every-block executes as ONE
            # job at the boundary truncate (broadcast exchanges inside the block
            # run once each within that job); delta/ckpt actions read only
            # checkpointed states, so the block is never re-executed
            state = new_state
            info["iterations"] = it + 1
            if at_boundary(it, check_every) or it == max_iter - 1:
                prev = last_checkpoint
                state = truncate(state, None)
                last_checkpoint = state
                delta = None
                if tol > 0:
                    # block delta over check_every supersteps — conservative
                    delta = (
                        state.join(prev.select("vertex", F.col("rank").alias("old")), "vertex")
                        .agg(F.max(F.abs(F.col("rank") - F.col("old"))).alias("d"))
                        .collect()[0]["d"]
                    )
                release(prev)
                if ckpt is not None:
                    elapsed = max(_time.monotonic() - block_t0, 1e-9)
                    eps = (m_edges or 0) * check_every / elapsed
                    ckpt.save_superstep(
                        it,
                        state.select("vertex", "rank"),
                        per_partition,
                        None if delta is None else float(delta),
                        eps,
                    )
                    block_t0 = _time.monotonic()
                if delta is not None and delta <= tol:
                    info["converged"] = True
                    info["delta"] = float(delta)
                    break
    finally:
        info["superstep_seconds"] = _time.monotonic() - loop_t0
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if und_jvm is not None:
            release(und_jvm)
        if replicas_by_vertex is not None:
            release(replicas_by_vertex)
        if edges_by_bucket is not None:
            release(edges_by_bucket)
            release(replicas)
    release(deg)
    return state.select("vertex", "rank"), info
