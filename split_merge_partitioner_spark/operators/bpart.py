"""BPart two-phase vertex-balance partitioner (vertex partitioner).

Reference parity (/root/reference/src/bpart_partitioner.{hpp,cpp}):
- phase 1: stream vertices into FINE buckets with Fennel-style scoring
  score(v, b) = |N(v) ∩ V_b| − alpha·gamma·w_b^(gamma−1), gamma = 1.5,
  alpha = 1.5 (hpp:45-47), with the HYBRID weight
  w_b = |V_b| + 2·|E_b|/avg_degree (assign_vertex, cpp:305-313; |E_b| grows
  by the overlap each assignment)
- phase 2: sort fine buckets by vertex count and pair-merge smallest with
  largest via union-find (cpp:133-172)

Implemented flavor: the reference's FIRST outer pass (iter=1: 2·p fine
buckets, one pair-merge round, all merged pairs accepted — the `or iter == 1`
branch at cpp:190), with partition-local stream state like our Fennel
(documented deviations; the reference's multi-pass refinement re-streams
rejected buckets, which at Spark scale is better served by the FSM
split-merge this repo centers on — BPart is kept as the paper's Table-4
comparison baseline).

Blocked variant (the default, ``block_size`` knob — the hdrf.py/fennel.py
recipe): the overlap matrix for a block of B vertices is ONE np.add.at
scatter over the flattened adjacency against block-start placements (the
per-neighbor cost, i.e. the speedup source); the weight penalty, n_v/n_e
bumps, and placement state stay LIVE per vertex (a frozen penalty would
sequential-fill one fine bucket per block of tie-scored vertices).  Placement state is fennel.py's
dense int16 array (one fancy-index lookup per block, dict fallback for
hash-space ids).  In-block placements are invisible to later in-block
overlap terms (documented stream variant; the reference is
stream-order-sensitive anyway).  block_size=1 reproduces the per-vertex
kernel exactly (tested).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAMMA = 1.5   # bpart_partitioner.hpp:45
ALPHA = 1.5   # bpart_partitioner.hpp:46


def _phase2_final_of(n_v: np.ndarray, nf: int, hub_map: dict[int, int] | None):
    """Phase 2: pair-merge smallest+largest fine bucket by vertex count
    (cpp:150-166), then (with hubs) permute final labels so fine bucket 2b —
    seeded with hub b's neighbors — lands on fission bucket b where possible
    (the pair-merge's labels are an arbitrary bijection onto [0, p))."""
    order = np.argsort(n_v, kind="stable")
    final_of = np.empty(nf, dtype=np.int64)
    for i in range(nf // 2):
        final_of[order[i]] = i
        final_of[order[nf - i - 1]] = i
    if hub_map:
        want = {}
        for b in set(hub_map.values()):
            want.setdefault(int(final_of[2 * b]), b)
        relabel = {}
        taken = set()
        for cur, tgt in sorted(want.items()):
            if tgt not in taken:
                relabel[cur] = tgt
                taken.add(tgt)
        free = iter(x for x in range(nf // 2) if x not in taken)
        lab_perm = np.empty(nf // 2, dtype=np.int64)
        for lab in range(nf // 2):
            lab_perm[lab] = relabel.get(lab, -1)
        for lab in range(nf // 2):
            if lab_perm[lab] < 0:
                lab_perm[lab] = next(free)
        final_of = lab_perm[final_of]
    return final_of


def _bpart_task(p: int, avg_degree: float, hub_map: dict[int, int] | None = None):
    nf = 2 * p  # fine buckets of the first pass (2^iter * p, iter=1)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_v = np.zeros(nf, dtype=np.int64)
        n_e = np.zeros(nf, dtype=np.int64)
        rows: list[pd.DataFrame] = []
        # fission-assigned hubs seeded at fine id = 2*final (scoring only;
        # they are emitted by the caller, not by this task)
        fine_of: dict[int, int] = (
            {v: 2 * b for v, b in hub_map.items()} if hub_map else {}
        )
        for pdf in batches:
            verts = pdf["vertex"].to_numpy(np.int64)
            out = np.empty(len(verts), dtype=np.int64)
            for i, (v, nbrs) in enumerate(zip(verts, pdf["nbrs"])):
                w = n_v + 2.0 * n_e / avg_degree
                s = -ALPHA * GAMMA * np.power(w, GAMMA - 1.0)
                placed = [fine_of[u] for u in map(int, nbrs) if u in fine_of]
                overlap = np.bincount(placed, minlength=nf)
                s = s + overlap
                best = int(s.argmax())
                out[i] = best
                fine_of[int(v)] = best
                n_v[best] += 1
                n_e[best] += overlap[best]
            rows.append(pd.DataFrame({"vertex": verts, "fine": out}))
        if not rows:
            return
        final_of = _phase2_final_of(n_v, nf, hub_map)
        allrows = pd.concat(rows)
        yield pd.DataFrame(
            {"vertex": allrows["vertex"], "bucket": final_of[allrows["fine"].to_numpy()]}
        )

    return run


def _bpart_task_blocked(
    p: int, avg_degree: float, block_size: int, hub_map: dict[int, int] | None = None
):
    """Blocked phase-1 stream kernel (module docstring): ONE scatter-add
    overlap matrix per block; weight penalty and n_v/n_e/placement updates
    live per vertex (n_e grows by the FROZEN overlap[best], the same value
    the frozen score saw).  Geometric block warm-up as in fennel.py — early
    placements are the locality anchors, so first blocks start at 1 and
    double up to block_size."""
    nf = 2 * p

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .fennel import _DensePlacement

        n_v = np.zeros(nf, dtype=np.int64)
        n_e = np.zeros(nf, dtype=np.int64)
        rows: list[pd.DataFrame] = []
        state = _DensePlacement(
            {v: 2 * b for v, b in hub_map.items()} if hub_map else None
        )
        cur_bs = 1
        for pdf in batches:
            verts = pdf["vertex"].to_numpy(np.int64)
            nbrs_col = pdf["nbrs"]
            out = np.empty(len(verts), dtype=np.int64)
            lo = 0
            while lo < len(verts):
                hi = min(lo + cur_bs, len(verts))
                cur_bs = min(cur_bs * 2, block_size)
                lst = list(nbrs_col.iloc[lo:hi])
                counts = np.fromiter((len(x) for x in lst), np.int64, hi - lo)
                flat = (
                    np.concatenate(lst).astype(np.int64, copy=False)
                    if lst
                    else np.empty(0, np.int64)
                )
                pb = state.lookup(flat)
                rrows = np.repeat(np.arange(hi - lo, dtype=np.int32), counts)
                placed = pb >= 0
                inter = np.zeros((hi - lo, nf), dtype=np.float64)
                np.add.at(inter, (rrows[placed], pb[placed]), 1.0)
                vlist = verts[lo:hi].tolist()
                # weight penalty LIVE per vertex (a frozen penalty sends
                # every tie-scored vertex to the same argmax fine bucket for
                # a whole block — sequential fill, caught by the balance
                # tests); maintained incrementally — one placement changes
                # one fine bucket's (n_v, n_e), so one scalar pow per vertex
                pen = (ALPHA * GAMMA) * np.power(
                    n_v + 2.0 * n_e / avg_degree, GAMMA - 1.0
                )
                for i in range(hi - lo):
                    s_i = inter[i] - pen
                    best = int(np.argmax(s_i))
                    out[lo + i] = best
                    state.set(vlist[i], best)
                    n_v[best] += 1
                    n_e[best] += int(inter[i, best])
                    pen[best] = (ALPHA * GAMMA) * (
                        n_v[best] + 2.0 * n_e[best] / avg_degree
                    ) ** (GAMMA - 1.0)
                lo = hi
            rows.append(pd.DataFrame({"vertex": verts, "fine": out}))
        if not rows:
            return
        final_of = _phase2_final_of(n_v, nf, hub_map)
        allrows = pd.concat(rows)
        yield pd.DataFrame(
            {"vertex": allrows["vertex"], "bucket": final_of[allrows["fine"].to_numpy()]}
        )

    return run


def bpart_partition(
    edges: DataFrame, p: int, hub_threshold: int | None = None,
    block_size: int = 256,
) -> DataFrame:
    """(vertex, bucket) BPart vertex partition into p buckets (first-pass
    flavor; partition-local stream state; degree > hub_threshold vertices
    take the fission path — see fennel._hub_split_adjacency).  Feed
    ``vertex2edge_partition`` for an edge-cut.  block_size: scoring-state
    refresh granularity (module docstring); 1 = exact per-vertex streaming."""
    from .fennel import DEFAULT_HUB_THRESHOLD, _hub_split_adjacency

    m = edges.count()
    adj, hub_df, hub_map, n = _hub_split_adjacency(
        edges, p, hub_threshold if hub_threshold is not None else DEFAULT_HUB_THRESHOLD
    )
    avg_degree = 2.0 * m / max(n, 1)
    kernel = (
        _bpart_task(p, avg_degree, hub_map)
        if block_size <= 1
        else _bpart_task_blocked(p, avg_degree, block_size, hub_map)
    )
    streamed = adj.orderBy("vertex").mapInPandas(
        kernel, schema="vertex long, bucket long"
    )
    return streamed.unionAll(hub_df) if hub_map else streamed
