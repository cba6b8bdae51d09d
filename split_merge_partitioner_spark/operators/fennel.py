"""Fennel single-pass vertex partitioner.

Reference parity (/root/reference/src/fennel_partitioner.cpp):
- stream vertices 0..n-1; assign to argmax_b |N(v) ∩ V_b| − α·γ·|V_b|^(γ−1)
  with γ = 1.5, α = sqrt(p)·m/n^1.5 (:39,61-132; score fennel_partitioner.hpp:47-49)
- capacity 1.1·n/p (:49)

Distribution note (same family as HDRF/EBV): vertex stream state is
partition-local per task; the adjacency is delivered as a grouped
neighbor-list DataFrame.  Because each vertex lives in exactly one bucket,
|N(v) ∩ V_b| for ALL buckets is one bincount of the placed neighbors'
buckets — the scoring is a p-vector expression per vertex, no per-bucket
loop.  Returns a VERTEX partition (vertex, bucket) — feed
``vertex2edge_partition`` for an edge-cut.

Blocked variant (the default, ``block_size`` knob — the hdrf.py recipe):
the NEIGHBOR-INTERSECTION matrix for a block of B vertices is ONE
np.add.at scatter over the block's flattened (np.concatenate, C-speed)
adjacency against block-start placements — that term is the per-neighbor
cost and the speedup source — while the size penalty, capacity check, size
bumps, and placement state stay LIVE per vertex (a frozen size penalty
would send every tie-scored vertex to the same argmax bucket for a whole
block — sequential fill; caught by the balance tests).  Placement state is a DENSE int16 array indexed by
vertex id (placed-neighbor lookup = one fancy-index op, ~2ns/neighbor vs
~150ns/dict hit; per-task memory 2*max_id bytes, renumbered ids assumed —
automatic per-element dict fallback beyond ``_DENSE_ID_LIMIT`` or for
negative ids).  Deviation vs per-vertex streaming: placements made INSIDE
the current block are invisible to later in-block intersection terms (the
reference is stream-order-sensitive anyway, so block-boundary state is a
legitimate stream variant, same argument as hdrf.py).  block_size=1
reproduces the per-vertex kernel exactly (tested); ~2.4x kernel wall-clock
at p=32 on a 2.3M-edge random stream (the batched scatter is the win; the
penalty/capacity stay per-vertex for correctness, held to one scalar pow
each via incremental maintenance).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GAMMA = 1.5

# neighbor lists above this degree are never materialized as one Arrow row;
# such hubs take the fission path (assigned by vertex % p, like HybridBL's
# high-degree fission, src/hybridbl_partitioner.cpp:210-225)
DEFAULT_HUB_THRESHOLD = 1_000_000


def _hub_split_adjacency(edges: DataFrame, p: int, hub_threshold: int):
    """Skew-safe adjacency delivery for the vertex-streaming baselines:
    returns (adj_low, hub_df, hub_map, n_vertices).

    adj_low: (vertex, nbrs) grouped neighbor lists for vertices with
    degree <= hub_threshold ONLY — a power-law hub's list (potentially
    multi-GB as one Arrow row) is never built.  hub_df: (vertex, bucket)
    deterministic fission assignment bucket = vertex % p for the hubs.
    hub_map: the same as a driver dict (bounded by 2m/hub_threshold entries)
    for seeding stream kernels so low vertices still score against placed
    hub neighbors."""
    und = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).unionAll(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    deg = und.groupBy(F.col("v").alias("vertex")).agg(F.count(F.lit(1)).alias("degree"))
    n = deg.count()
    hub_df = (
        deg.where(F.col("degree") > hub_threshold)
        .select("vertex", F.pmod("vertex", F.lit(p)).cast("long").alias("bucket"))
        .localCheckpoint(eager=True)
    )
    hub_map = {int(r["vertex"]): int(r["bucket"]) for r in hub_df.collect()}
    low = und
    if hub_map:
        low = und.join(
            F.broadcast(hub_df.select(F.col("vertex").alias("v"))), "v", "left_anti"
        )
    adj_low = low.groupBy(F.col("v").alias("vertex")).agg(
        F.collect_list("w").alias("nbrs")
    )
    return adj_low, hub_df, hub_map, n


def _fennel_task(p: int, alpha: float, hub_map: dict[int, int] | None = None):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sizes = np.zeros(p, dtype=np.int64)
        # each vertex lives in exactly one bucket; pre-seeded with the
        # fission-assigned hubs so low vertices score against them
        bucket_of: dict[int, int] = dict(hub_map) if hub_map else {}
        seen = 0
        for pdf in batches:
            verts = pdf["vertex"].to_numpy(np.int64)
            out = np.empty(len(verts), dtype=np.int64)
            for i, (v, nbrs) in enumerate(zip(verts, pdf["nbrs"])):
                # self-normalizing capacity: 1.1 * (stream position)/p, so the
                # reference's 1.1*n/p bound holds per task whatever the task
                # count (fennel_partitioner.cpp:49)
                capacity = 1.1 * max(seen, p) / p + 1
                # |N(v) ∩ V_b| for ALL b at once: neighbors' buckets bincount
                placed = [bucket_of[u] for u in map(int, nbrs) if u in bucket_of]
                s = np.bincount(placed, minlength=p).astype(np.float64)
                s -= alpha * GAMMA * np.power(sizes, GAMMA - 1.0)
                s[sizes >= capacity] = -np.inf
                best_b = int(s.argmax())
                if s[best_b] == -np.inf:
                    # every bucket at capacity: spill to the current smallest
                    # (keeps the 1.1n/p invariant tight instead of piling
                    # overflow onto bucket 0)
                    best_b = int(np.argmin(sizes))
                out[i] = best_b
                sizes[best_b] += 1
                bucket_of[int(v)] = best_b
                seen += 1
            yield pd.DataFrame({"vertex": verts, "bucket": out})

    return run


_DENSE_ID_LIMIT = 1 << 27  # 2*128M = 256 MB per-task placement array, max


class _DensePlacement:
    """vertex -> bucket placement state for the blocked vertex-stream kernels:
    a dense int16 array indexed by vertex id (grown geometrically, -1 =
    unplaced) so a whole block's neighbor lookup is ONE fancy-index op.
    Falls back to a dict permanently if any id is negative or beyond
    _DENSE_ID_LIMIT (hash-space ids) — same semantics, per-element cost."""

    def __init__(self, seed: dict[int, int] | None):
        self.arr = np.full(1 << 16, -1, dtype=np.int16)
        self.dict: dict[int, int] | None = None
        if seed:
            for v, b in seed.items():
                self.set(v, b)

    def _grow(self, need: int) -> bool:
        if need > _DENSE_ID_LIMIT or need < 0:
            self.dict = {
                int(v): int(b) for v, b in enumerate(self.arr) if b >= 0
            }
            self.arr = None
            return False
        if need > len(self.arr):
            na = np.full(max(need, 2 * len(self.arr)), -1, dtype=np.int16)
            na[: len(self.arr)] = self.arr
            self.arr = na
        return True

    def lookup(self, flat: np.ndarray) -> np.ndarray:
        """block-start placements for a flattened neighbor array (-1 =
        unplaced).  Returns int16 in dense mode / int64 in dict mode —
        callers only index and compare, so the dtype never matters."""
        if self.dict is None:
            mx = int(flat.max()) if len(flat) else 0
            mn = int(flat.min()) if len(flat) else 0
            if mn >= 0 and self._grow(mx + 1):
                return self.arr[flat]
            if self.dict is None:  # negative ids: switch modes explicitly
                self._grow(-1)
        get = self.dict.get
        return np.fromiter(
            (get(int(u), -1) for u in flat), np.int64, len(flat)
        )

    def set(self, v: int, b: int) -> None:
        if self.dict is not None:
            self.dict[v] = b
        elif 0 <= v < len(self.arr):
            self.arr[v] = b
        elif v >= 0 and self._grow(v + 1):
            self.arr[v] = b
        else:
            if self.dict is None:
                self._grow(-1)
            self.dict[v] = b


def _fennel_task_blocked(
    p: int, alpha: float, block_size: int, hub_map: dict[int, int] | None = None
):
    """Blocked stream kernel (module docstring): intersection counts for a
    whole block come from ONE np.add.at scatter over the flattened adjacency
    against block-start placements.  The size penalty and the capacity check
    stay LIVE per vertex — freezing the penalty too would send every
    tie-scored vertex (no placed neighbors yet) to the SAME argmax bucket
    for a whole block, i.e. sequential fill (caught by the balance tests).
    The batched scatter is the speedup; the per-vertex p-vector penalty is
    cheap."""
    assert p < (1 << 15), "placement state is int16"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sizes = np.zeros(p, dtype=np.int64)
        state = _DensePlacement(hub_map)
        seen = 0
        # geometric warm-up (1, 2, 4, ... block_size): the stream's EARLY
        # placements are the locality anchors every later vertex scores
        # against — full-size first blocks would make a short task's whole
        # stream mutually invisible (quality ~ random hash, caught by the
        # cut-ratio test), while on long tasks the warm-up is O(log B) of
        # the work and everything after runs at full block size
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
                rows = np.repeat(np.arange(hi - lo, dtype=np.int32), counts)
                placed = pb >= 0
                inter = np.zeros((hi - lo, p), dtype=np.float64)
                np.add.at(inter, (rows[placed], pb[placed]), 1.0)
                obuf = [0] * (hi - lo)
                vlist = verts[lo:hi].tolist()
                # penalty vector maintained INCREMENTALLY: one placement
                # changes one bucket's size, so one scalar pow per vertex
                # (a full p-vector np.power per vertex halves the speedup)
                pen = (alpha * GAMMA) * np.power(
                    sizes.astype(np.float64), GAMMA - 1.0
                )
                for i in range(hi - lo):
                    s_i = inter[i] - pen
                    capacity = 1.1 * (seen if seen > p else p) / p + 1
                    best_b = int(np.argmax(s_i))
                    if sizes[best_b] >= capacity:
                        best_b = -1
                        for b in np.argsort(-s_i, kind="stable").tolist():
                            if sizes[b] < capacity:
                                best_b = b
                                break
                        if best_b < 0:
                            best_b = int(np.argmin(sizes))
                    obuf[i] = best_b
                    sizes[best_b] += 1
                    pen[best_b] = (alpha * GAMMA) * float(sizes[best_b]) ** (
                        GAMMA - 1.0
                    )
                    state.set(vlist[i], best_b)
                    seen += 1
                out[lo:hi] = obuf
                lo = hi
            yield pd.DataFrame({"vertex": verts, "bucket": out})

    return run


def fennel_partition(
    edges: DataFrame,
    p: int,
    hub_threshold: int = DEFAULT_HUB_THRESHOLD,
    block_size: int = 256,
) -> DataFrame:
    """(vertex, bucket) Fennel vertex partition (partition-local stream state;
    degree > hub_threshold vertices take the fission path — see
    _hub_split_adjacency).  block_size: scoring-state refresh granularity
    (module docstring); 1 = exact per-vertex streaming."""
    m = edges.count()
    adj, hub_df, hub_map, n = _hub_split_adjacency(edges, p, hub_threshold)
    alpha = math.sqrt(p) * m / (n**1.5)
    kernel = (
        _fennel_task(p, alpha, hub_map)
        if block_size <= 1
        else _fennel_task_blocked(p, alpha, block_size, hub_map)
    )
    streamed = adj.orderBy("vertex").mapInPandas(
        kernel, schema="vertex long, bucket long"
    )
    return streamed.unionAll(hub_df) if hub_map else streamed
