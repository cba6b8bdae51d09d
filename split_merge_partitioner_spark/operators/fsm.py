"""FSM dual-balanced split-merge partitioning as a DataFrame-level planner.

Reference parity (/root/reference/src/fsm_partitioner.{hpp,cpp}):
- split with k*p fine-grained buckets:      fsm_partitioner.cpp:33-38,266
- merge: sort sub-buckets desc by replicas: fsm_partitioner.cpp:82-85
- fast_merge (min-PQ on (mirrors, inside)): fsm_partitioner.cpp:128-160
- precise_merge (min union-popcount scan):  fsm_partitioner.cpp:162-217
- merge_bucket (bitset OR + popcount):      fsm_partitioner.cpp:239-255
- rearrange_edge (old->final remap):        fsm_partitioner.hpp:114-129
- k*p < 255 default check:                  fsm_partitioner.cpp:31 (we allow more)

Spark-first architecture (NOT a port of the sequential NE/HEP expansion):

SPLIT  — distributed.  Three strategies:
  * "hep_local" locality-grouped HEP expansion (the reference's flagship
               fsm_hep split, src/hep_partitioner.cpp:305-371 at group
               granularity): lazy-degree min-heap expansion with high-degree
               exclusion, bucket-overflow to b+1, HDRF-scored remainder.
  * "dbh"      sub_bucket = lower-degree endpoint hashed into k*p buckets —
               a pure Catalyst expression, embarrassingly parallel, perfectly
               edge-balanced (the reference's DBH baseline at k*p granularity).
  * "ne_local" locality-grouped greedy neighbor expansion: edges grouped into
               p locality groups (hash of the lower-degree anchor endpoint),
               each group's applyInPandas task runs a sequential NE-lite
               (min-degree frontier expansion over a local NumPy CSR,
               mirroring src/ne_partitioner.hpp:68-161's contract) producing
               k capacity-bounded sub-buckets -> k*p global sub-buckets.
  High-degree hubs (degree > hdf*avg, src/hep_graph.cpp:17) are handled like
  HEP's h2h spill: edges between two hubs are salted uniformly across all
  k*p sub-buckets (the north-star "fine-grained splitting of high-degree
  vertices into sub-vertices": each hub's edge set is sharded by a seeded
  hash, every shard assigned independently).

MERGE  — small-data greedy planning on the driver, faithful to the reference.
  The greedy consumes union popcounts through a stats oracle with two
  implementations (merge_stats knob, default "auto"):
  * "driver": per-sub-bucket replica bitmaps collected to the driver (k*p
    bitmaps of n bits — exact and job-free at test scale);
  * "joins":  the 100-TB path — only (k·p) replica counts plus the (k·p)²
    pairwise-intersection matrix are collected (one self-join aggregation);
    running union sizes come from |A|+|B|-|A∩B|, exact with zero extra jobs
    for every step at k=2, and from one batched count-distinct join per step
    for parents that already hold >=2 sub-buckets (k>2).  Driver memory is
    O((k·p)²) scalars — never O(n).
  Either way the exact fast/precise greedy runs in plain Python and the
  old->final map (<= k*p rows) is broadcast-joined back onto the edges.

All bookkeeping is broadcast/driver state — no row-wise mutable grafts.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from pyspark.sql.types import LongType, StructField, StructType

from ..sources.edges import degrees as degrees_of
from .stats import replica_sets

DEFAULT_HDF = 100.0  # HEP high-degree factor default (src/main.cpp:29)


# ---------------------------------------------------------------------------
# merge-stat oracles: where union popcounts come from
# ---------------------------------------------------------------------------
#
# The greedy merge (fsm_partitioner.cpp:128-217) consumes three statistics:
# per-sub-bucket |V_b|, per-sub-bucket |E_b|, and union sizes |U ∪ V_b| where
# U is the running replica union of a final bucket.  The reference gets them
# from driver-resident dense bitsets; we abstract the source so the SAME
# greedy runs against either
#   * _BitmapMergeStats — collected NumPy bool bitmaps (test scale; exact,
#     zero extra Spark jobs), or
#   * _OverlapJoinMergeStats — the scale path (SURVEY.md §2.2 P11/P12): only
#     (k·p) replica counts + the (k·p)² pairwise-intersection matrix are
#     collected (one self-join aggregation); union sizes come from
#     |A|+|B|−|A∩B| (exact for single-member parents — i.e. for ALL steps at
#     k=2), and for parents that already absorbed ≥2 sub-buckets from one
#     batched count-distinct join per merge step.  Driver memory is O((k·p)²)
#     scalars, never O(n).


class _BitmapMergeStats:
    """Union popcounts from driver-side bool bitmaps (merge_bucket,
    fsm_partitioner.cpp:239-255)."""

    def __init__(self, replicas: dict[int, int], occupied: dict[int, int],
                 bitmaps: dict[int, np.ndarray]):
        self._replicas = replicas
        self._occupied = occupied
        self._bitmaps = bitmaps
        self._parents: dict[int, np.ndarray] = {}

    def replicas(self, sub: int) -> int:
        return self._replicas[sub]

    def occupied(self, sub: int) -> int:
        return self._occupied[sub]

    def new_parent(self, key: int, sub: int) -> int:
        self._parents[key] = self._bitmaps[sub].copy()
        return self._replicas[sub]

    def absorb(self, key: int, sub: int, retire: bool = False) -> int:
        bm = self._parents[key]
        np.logical_or(bm, self._bitmaps[sub], out=bm)
        return int(bm.sum())

    def peek_all(self, sub: int, keys: list[int]) -> dict[int, int]:
        sb = self._bitmaps[sub]
        return {
            key: int(np.logical_or(self._parents[key], sb).sum()) for key in keys
        }


class _OverlapJoinMergeStats:
    """Union popcounts from incrementally maintained intersection VECTORS —
    no O(n) driver state (SURVEY.md §2.2 P11/P12; union semantics match
    merge_bucket, fsm_partitioner.cpp:239-255).

    Invariant: for every live parent key, ``_inter[key][s] = |U_key ∩ V_s|``
    for ALL sub-buckets s (seeded from the pairwise overlap matrix at
    new_parent, recomputed by ONE aggregated count-distinct join per
    non-retiring absorb).  Every peek is then pure driver arithmetic
    (|U ∪ V_s| = |U| + |V_s| − inter[s]), so the greedy issues at most
    (k−2)·p Spark jobs total — and ZERO at the default k=2, where every
    absorb retires its parent."""

    def __init__(self, reps: DataFrame, replicas: dict[int, int],
                 occupied: dict[int, int], overlap: np.ndarray):
        self._reps = reps  # persisted (bucket, vertex) distinct relation
        self._replicas = replicas
        self._occupied = occupied
        self._overlap = overlap  # [n_sub, n_sub] pairwise |A ∩ B|
        # parent key -> (member sub ids, current union size)
        self._parents: dict[int, tuple[list[int], int]] = {}
        # parent key -> |union ∩ V_s| vector over all n_sub sub-buckets
        self._inter: dict[int, np.ndarray] = {}
        self.jobs = 0  # instrumentation: Spark jobs issued for union updates

    def replicas(self, sub: int) -> int:
        return self._replicas[sub]

    def occupied(self, sub: int) -> int:
        return self._occupied[sub]

    def new_parent(self, key: int, sub: int) -> int:
        size = self._replicas[sub]
        self._parents[key] = ([sub], size)
        self._inter[key] = self._overlap[sub].astype(np.int64).copy()
        return size

    def peek_all(self, sub: int, keys: list[int]) -> dict[int, int]:
        rs = self._replicas[sub]
        return {
            key: self._parents[key][1] + rs - int(self._inter[key][sub])
            for key in keys
        }

    def absorb(self, key: int, sub: int, retire: bool = False) -> int:
        members, size = self._parents[key]
        new_size = size + self._replicas[sub] - int(self._inter[key][sub])
        members = members + [sub]
        self._parents[key] = (members, new_size)
        if not retire:
            # refresh this parent's intersection vector in ONE aggregated
            # join: distinct union vertices ⋈ reps, counted per bucket
            union_v = (
                self._reps.where(F.col("bucket").isin([int(b) for b in members]))
                .select("vertex")
                .distinct()
            )
            rows = (
                self._reps.join(union_v, "vertex")
                .groupBy("bucket")
                .agg(F.count(F.lit(1)).alias("c"))
                .collect()
            )
            self.jobs += 1
            v = np.zeros(len(self._overlap), dtype=np.int64)
            for r in rows:
                v[int(r["bucket"])] = int(r["c"])
            self._inter[key] = v
        return new_size


DRIVER_BITMAP_THRESHOLD = 5_000_000  # replica rows; above this, overlap joins


def build_merge_stats(
    reps: DataFrame,
    n_sub: int,
    occupied: dict[int, int],
    merge_stats: str = "auto",
    replicas: dict[int, int] | None = None,
):
    """Build a merge-stat oracle from a (bucket, vertex) membership relation.

    Generic over WHAT the members are: FSM merges over vertex replica sets;
    the v2e k-split merge (vertex2edgepart.hpp:133-226) feeds edge-ids in the
    vertex column.  Returns (stats_oracle, replicas dict).

    replicas: pass the per-bucket |V_b| dict if the caller already computed
    it (fsm_partition fuses it with the occupancy agg) to skip one job."""
    if replicas is None:
        r_rows = reps.groupBy("bucket").agg(F.count(F.lit(1)).alias("r")).collect()
        replicas = {old_id: 0 for old_id in range(n_sub)}
        replicas.update({int(r["bucket"]): int(r["r"]) for r in r_rows})
    n_replica_rows = sum(replicas.values())

    if merge_stats == "auto":
        merge_stats = "driver" if n_replica_rows <= DRIVER_BITMAP_THRESHOLD else "joins"
    if merge_stats == "driver":
        rep_pdf = reps.toPandas()
        verts = np.unique(rep_pdf["vertex"].to_numpy(np.int64))
        vidx = {int(v): i for i, v in enumerate(verts)}
        n_dense = len(verts)
        bitmaps: dict[int, np.ndarray] = {}
        grouped = rep_pdf.groupby("bucket")["vertex"]
        members = {int(b): v.to_numpy(np.int64) for b, v in grouped}
        for old_id in range(n_sub):
            bm = np.zeros(n_dense, dtype=bool)
            mem = members.get(old_id)
            if mem is not None:
                bm[[vidx[int(v)] for v in mem]] = True
            bitmaps[old_id] = bm
        return _BitmapMergeStats(replicas, occupied, bitmaps), replicas
    if merge_stats == "joins":
        # (k·p)² pairwise intersections from ONE self-join aggregation —
        # the |A|+|B|−|A∩B| formulation (SURVEY.md §2.2 P11/P12)
        pair_rows = (
            reps.alias("a")
            .join(reps.alias("b"), "vertex")
            .groupBy(F.col("a.bucket").alias("ba"), F.col("b.bucket").alias("bb"))
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        overlap = np.zeros((n_sub, n_sub), dtype=np.int64)
        for r in pair_rows:
            overlap[int(r["ba"]), int(r["bb"])] = int(r["c"])
        return _OverlapJoinMergeStats(reps, replicas, occupied, overlap), replicas
    raise ValueError(f"unknown merge_stats {merge_stats!r}")


# ---------------------------------------------------------------------------
# driver-side greedy merge (faithful to fsm_partitioner.cpp:128-217)
# ---------------------------------------------------------------------------

@dataclass
class FsmResult:
    assigned: DataFrame              # (src, dst, bucket) final, bucket in [0, p)
    sub_assigned: DataFrame          # (src, dst, bucket) split phase, [0, k*p)
    merge_map: dict[int, int]        # old sub-bucket -> final bucket
    p: int
    k: int
    subbuckets_per_final: dict[int, int] = field(default_factory=dict)


class _FinalIds:
    """Sequential final-bucket id assignment (get_final_bucket,
    fsm_partitioner.hpp:231-238)."""

    def __init__(self) -> None:
        self._ids: dict[int, int] = {}

    def get(self, old_id: int) -> int:
        if old_id not in self._ids:
            self._ids[old_id] = len(self._ids)
        return self._ids[old_id]


def fast_merge(order: list[int], stats, p: int, k: int) -> dict[int, int]:
    """Greedy pack into the min-replica final bucket (fsm_partitioner.cpp:128-160).

    order: sub-bucket ids sorted desc by replicas (fsm_partitioner.cpp:82-85).
    stats: a merge-stat oracle (_BitmapMergeStats or _OverlapJoinMergeStats).
    A final bucket is retired after absorbing k sub-buckets; the PQ key is
    (running union size, sub-buckets inside), mirroring merge_bucket :239-255.
    """
    finals = _FinalIds()
    valid: dict[int, int] = {}
    # (mirror_cnt, partitions_inside, parent_key, final_id)
    pq: list[tuple[int, int, int, int]] = [(0, 0, b, b) for b in range(p)]
    heapq.heapify(pq)
    for b, sub in enumerate(order):
        mirror_cnt, inside, parent_key, parent_final = heapq.heappop(pq)
        if inside == 0:
            parent_final = finals.get(sub)
            size = stats.new_parent(b, sub)
            heapq.heappush(pq, (size, 1, b, parent_final))
        else:
            size = stats.absorb(parent_key, sub, retire=inside + 1 >= k)
            if inside + 1 < k:
                heapq.heappush(pq, (size, inside + 1, parent_key, parent_final))
        valid[sub] = parent_final
    return valid


def precise_merge(order: list[int], stats, p: int, k: int) -> dict[int, int]:
    """For each sub-bucket (desc by replicas) scan every non-full final bucket
    and pick the min union-popcount; first empty slot short-circuits
    (fsm_partitioner.cpp:162-217)."""
    finals = _FinalIds()
    valid: dict[int, int] = {}
    # slots: [inside, parent_key, final_id]
    slots: list[list[int]] = [[0, b, b] for b in range(p)]
    for b, sub in enumerate(order):
        open_slots = [fb for fb, (inside, _, _) in enumerate(slots) if 0 < inside < k]
        empty = next((fb for fb, (inside, _, _) in enumerate(slots) if inside == 0), -1)
        best_fb = -1
        if empty >= 0:
            # empty final bucket short-circuits (fsm_partitioner.cpp:178-183)
            best_fb = empty
        else:
            assert open_slots, "no non-full final bucket (k*p capacity exhausted)"
            sizes = stats.peek_all(sub, [slots[fb][1] for fb in open_slots])
            best_size = None
            for fb in open_slots:
                new_size = sizes[slots[fb][1]]
                if best_size is None or new_size < best_size:
                    best_size = new_size
                    best_fb = fb
        inside, parent_key, parent_final = slots[best_fb]
        if inside == 0:
            parent_final = finals.get(sub)
            stats.new_parent(b, sub)
            slots[best_fb] = [1, b, parent_final]
        else:
            stats.absorb(parent_key, sub, retire=inside + 1 >= k)
            slots[best_fb] = [inside + 1, parent_key, parent_final]
        valid[sub] = parent_final
    return valid


# ---------------------------------------------------------------------------
# split phase
# ---------------------------------------------------------------------------

def _split_dbh(edges_dd: DataFrame, n_sub: int, portable: bool = False) -> DataFrame:
    """DBH at k*p granularity: hash the lower-degree endpoint (ties -> src),
    matching src/dbh_partitioner.cpp:80-83 but with a seeded 64-bit hash so
    sub-bucket contents are locality-free yet deterministic.

    portable=True uses the reference's literal ``w % n_sub``
    (dbh_partitioner.cpp:83) — ANSI-SQL-expressible, so the full
    split->merge->rearrange pipeline earns a cross-engine hash-match oracle
    (__spark_entry__ "fsm_assign_portable")."""
    w = F.when(F.col("deg_src") <= F.col("deg_dst"), F.col("src")).otherwise(F.col("dst"))
    h = F.pmod(w, F.lit(n_sub)) if portable else F.pmod(F.xxhash64(w, F.lit(42)), F.lit(n_sub))
    return edges_dd.select("src", "dst", h.cast("long").alias("bucket"))


_NE_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("bucket", LongType()),
    ]
)


def _parent_slot(g: int, p: int, n_groups: int) -> int:
    """Map locality group g in [0, n_groups) to its parent slot in [0, p).

    When task-memory bounding forces n_groups > p (fsm_partition's
    edges_per_task), contiguous groups share a parent — range locality is
    preserved and the sub-bucket space stays exactly k*p, so the merge phase
    is oblivious to the finer split (the fsm_partitioner.cpp:33-38 contract:
    any fine-grained split feeds the same merge)."""
    return g if n_groups <= p else g * p // n_groups


def _ne_lite_group(k: int, global_buckets: bool = False, p: int | None = None,
                   n_groups: int | None = None):
    """Factory for the per-group NE-lite kernel (runs inside applyInPandas).

    global_buckets=True emits bucket ids in [0, k) directly instead of
    offsetting by the locality-group id — used by the standalone NE baseline
    (operators/ne.py) where every group writes into the same bucket space.
    p/n_groups: see _parent_slot (bounded-task-memory splitting).

    Faithful transcription of NE's expansion contract
    (src/ne_partitioner.hpp:68-130, cpp:113-167):
    - per-bucket core and boundary sets; an edge is assigned when the other
      endpoint is in the CURRENT bucket's core (always) or boundary (only
      while occupied < capacity) — never to uncovered vertices
    - occupying a vertex pulls ALL its remaining neighbors into the boundary
      (occupy_vertex, hpp:112-130)
    - the min-heap is keyed by REMAINING (unassigned-incident) degree,
      refreshed lazily on pop (assign_edge decrements degrees, hpp:55-66)
    - capacity = m_local/k + 1 (cpp:49, BALANCE_RATIO 1.00); leftovers go to
      the LAST bucket (assign_remaining, cpp:88-112)
    - free-vertex pick: deterministic min-static-degree scan per bucket
      (substitutes the reference's std::random_device scan — reproducibility
      requirement, SURVEY.md §7; the reference's get_free_vertex also skips
      degree > 2*avg, which min-degree-first order subsumes)

    NumPy CSR + heapq; one Arrow batch in/out per locality group.
    """

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        m_local = len(src)
        if m_local == 0:
            return pd.DataFrame({"src": src, "dst": dst, "bucket": src})
        verts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        ls, ld = inv[:m_local], inv[m_local:]
        nloc = len(verts)
        # local CSR over undirected incidence: vertex -> incident edge ids,
        # built fully vectorized (stable argsort of the 2m endpoint column =
        # counting-sort fill, graph.cpp:3-29's prefix-sum build without the
        # per-edge loop)
        ends = np.concatenate([ls, ld])
        deg = np.bincount(ends, minlength=nloc)
        offs = np.zeros(nloc + 1, dtype=np.int64)
        np.cumsum(deg, out=offs[1:])
        sort_order = np.argsort(ends, kind="stable")
        inc = np.tile(np.arange(m_local, dtype=np.int64), 2)[sort_order]
        other = np.where(ends[sort_order] == ld[inc], ls[inc], ld[inc])

        assigned = np.full(m_local, -1, dtype=np.int64)
        rem_deg = deg.astype(np.int64).copy()
        cap = m_local // k + 1
        occupied = np.zeros(k, dtype=np.int64)
        scan_order = np.argsort(deg, kind="stable")

        for b in range(k - 1):
            core = np.zeros(nloc, dtype=bool)
            boundary = np.zeros(nloc, dtype=bool)
            heap: list[tuple[int, int]] = []
            free_ptr = 0

            def add_boundary(v: int) -> None:
                if boundary[v]:
                    return
                boundary[v] = True
                if not core[v]:
                    heapq.heappush(heap, (int(rem_deg[v]), v))
                for ii in range(offs[v], offs[v + 1]):
                    e = int(inc[ii])
                    if assigned[e] >= 0:
                        continue
                    u = int(other[ii])
                    if core[u] or (boundary[u] and occupied[b] < cap):
                        assigned[e] = b
                        occupied[b] += 1
                        rem_deg[v] -= 1
                        rem_deg[u] -= 1

            while occupied[b] < cap:
                v = -1
                while heap:
                    d, cand = heapq.heappop(heap)
                    if core[cand]:
                        continue
                    if d != rem_deg[cand]:  # lazy key refresh
                        heapq.heappush(heap, (int(rem_deg[cand]), cand))
                        continue
                    v = cand
                    break
                if v < 0:
                    while free_ptr < nloc and (
                        core[scan_order[free_ptr]]
                        or rem_deg[scan_order[free_ptr]] == 0
                    ):
                        free_ptr += 1
                    if free_ptr >= nloc:
                        break
                    v = int(scan_order[free_ptr])
                core[v] = True
                add_boundary(v)
                for ii in range(offs[v], offs[v + 1]):
                    if assigned[int(inc[ii])] < 0:
                        add_boundary(int(other[ii]))
        assigned[assigned < 0] = k - 1
        if global_buckets:
            bucket = assigned
        else:
            parent = g if p is None or n_groups is None else _parent_slot(g, p, n_groups)
            bucket = np.int64(parent) * k + assigned
        return pd.DataFrame({"src": src, "dst": dst, "bucket": bucket})

    return kernel


def _hep_lite_group(k: int, high_thresh: float, lam: float = 1.1,
                    p: int | None = None, n_groups: int | None = None,
                    global_buckets: bool = False):
    """Factory for the per-group HEP kernel (runs inside applyInPandas).

    Per-group transcription of HEP's in-memory expansion contract
    (src/hep_partitioner.hpp:76-213, src/hep_partitioner.cpp:305-371):
    - high-degree vertices (GLOBAL degree > hdf*avg, src/hep_graph.cpp:17) are
      treated as permanently in-core: never expanded, never in the heap; their
      edges are assigned when the low endpoint enters a boundary (hpp:88-93)
    - lazy-degree min-heap: keys are remaining (unassigned-incident) degrees,
      refreshed on pop (HepMinHeap's lazy decrease_key, hep_min_heap.hpp:59-85)
    - an edge is assigned when the other endpoint is core/boundary/high
      (hpp:105-200); if the bucket is full mid-expansion the edge overflows to
      bucket+1 (hpp:126,140)
    - leftovers are HDRF-scored over all k buckets with the hard capacity
      check (in_memory_assign_remaining, cpp:167-201 + best_scored_partition
      cpp:374-416), deterministically (argmin-size instead of the reference's
      random pick when all buckets are full)

    One Arrow batch in/out per locality group; all hot loops are NumPy-array
    state with heapq — no Spark-row Python.
    """

    def kernel(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        g = int(key[0])
        src = pdf["src"].to_numpy(np.int64)
        dst = pdf["dst"].to_numpy(np.int64)
        m_local = len(src)
        if m_local == 0:
            return pd.DataFrame({"src": src, "dst": dst, "bucket": src})
        verts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
        ls, ld = inv[:m_local], inv[m_local:]
        nloc = len(verts)
        gdeg = np.zeros(nloc, dtype=np.float64)
        gdeg[ls] = pdf["deg_src"].to_numpy(np.float64)
        gdeg[ld] = pdf["deg_dst"].to_numpy(np.float64)
        is_high = gdeg > high_thresh
        # vectorized incidence CSR (vertex -> incident edge ids)
        ends = np.concatenate([ls, ld])
        deg = np.bincount(ends, minlength=nloc)
        offs = np.zeros(nloc + 1, dtype=np.int64)
        np.cumsum(deg, out=offs[1:])
        sort_order = np.argsort(ends, kind="stable")
        inc = np.tile(np.arange(m_local, dtype=np.int64), 2)[sort_order]
        # other endpoint per CSR slot: slot holds edge e at vertex v ->
        # other = ls[e] if v == ld[e] else ld[e]
        other = np.where(ends[sort_order] == ld[inc], ls[inc], ld[inc])

        assigned = np.full(m_local, -1, dtype=np.int64)
        rem_deg = deg.astype(np.int64).copy()
        in_core = np.zeros(nloc, dtype=bool)
        bmat = np.zeros((nloc, k), dtype=bool)  # per-bucket boundary sets
        occupied = np.zeros(k, dtype=np.int64)
        cap = m_local // k + 1
        free_order = np.argsort(gdeg, kind="stable")
        free_ptr = 0
        expansion_finished = False

        def add_boundary(v: int, b: int, heap: list) -> None:
            if bmat[v, b]:
                return
            bmat[v, b] = True
            if is_high[v]:
                in_core[v] = True  # hpp:88-93
                return
            if not in_core[v]:
                heapq.heappush(heap, (int(rem_deg[v]), v))
            for ii in range(offs[v], offs[v + 1]):
                e = int(inc[ii])
                if assigned[e] >= 0:
                    continue
                u = int(other[ii])
                if is_high[u] or in_core[u] or bmat[u, b]:
                    tb = b if occupied[b] < cap else b + 1  # overflow hpp:126
                    assigned[e] = tb
                    occupied[tb] += 1
                    rem_deg[v] -= 1
                    rem_deg[u] -= 1

        for b in range(k - 1):
            heap: list[tuple[int, int]] = []
            while occupied[b] < cap:
                v = -1
                while heap:
                    d, cand = heapq.heappop(heap)
                    if in_core[cand]:
                        continue
                    if d != rem_deg[cand]:  # lazy key refresh
                        heapq.heappush(heap, (int(rem_deg[cand]), cand))
                        continue
                    v = cand
                    break
                if v < 0:
                    while free_ptr < nloc and (
                        in_core[free_order[free_ptr]]
                        or is_high[free_order[free_ptr]]
                        or rem_deg[free_order[free_ptr]] == 0
                    ):
                        free_ptr += 1
                    if free_ptr >= nloc:
                        expansion_finished = True
                        break
                    v = int(free_order[free_ptr])
                in_core[v] = True
                add_boundary(v, b, heap)
                for ii in range(offs[v], offs[v + 1]):
                    # reach neighbors only through still-unassigned edges —
                    # same guard as the NE kernel and the reference, whose
                    # adjacency entries are invalidated once covered
                    # (in_memory_clean_up_neighbors, hep_partitioner.cpp:261-301)
                    if assigned[int(inc[ii])] < 0:
                        add_boundary(int(other[ii]), b, heap)
            if expansion_finished:
                break

        # HDRF-scored remainder over k-length NumPy vectors (cpp:167-201)
        remaining = np.flatnonzero(assigned < 0)
        for e in remaining:
            u, v = int(ls[e]), int(ld[e])
            degsum = gdeg[u] + gdeg[v]
            mx = occupied.max()
            s = lam * (mx - occupied) / (1.0 + mx - occupied.min())
            s += (2.0 - gdeg[u] / degsum) * bmat[u]
            s += (2.0 - gdeg[v] / degsum) * bmat[v]
            s[occupied >= cap] = -1.0
            tb = int(occupied.argmin()) if s.max() < 0.0 else int(s.argmax())
            assigned[e] = tb
            occupied[tb] += 1
            bmat[u, tb] = True
            bmat[v, tb] = True
        if global_buckets:
            bucket = assigned
        else:
            parent = g if p is None or n_groups is None else _parent_slot(g, p, n_groups)
            bucket = np.int64(parent) * k + assigned
        return pd.DataFrame({"src": src, "dst": dst, "bucket": bucket})

    return kernel


def _split_hep_local(
    edges_dd: DataFrame, p: int, k: int, high_thresh: float, grouping: str = "range",
    n_groups: int | None = None,
) -> DataFrame:
    """Locality grouping into n_groups (>= p, default p) groups, then
    per-group HEP expansion; each group's k local buckets land in its parent
    slot's k sub-buckets (the reference's flagship fsm_hep decomposition at
    group granularity, src/main.cpp:58-69; _parent_slot bounds task memory)."""
    n_groups = n_groups or p
    grouped = _locality_grouped(edges_dd, n_groups, grouping)
    return (
        grouped.select("grp", "src", "dst", "deg_src", "deg_dst")
        .groupBy("grp")
        .applyInPandas(
            _hep_lite_group(k, high_thresh, p=p, n_groups=n_groups), schema=_NE_SCHEMA
        )
    )


def _locality_grouped(edges_dd: DataFrame, p: int, grouping: str) -> DataFrame:
    """Add a locality group column grp in [0, p).

    grouping="range": edge-count-balanced ranges of the anchor id (cut points
    from approxQuantile) — preserves whatever id locality the graph has
    (generation order, crawl order, community renumbering), which is how web
    graph ids usually arrive; grouping="hash": seeded hash of the anchor —
    locality-free but robust to adversarial id layouts.
    """
    anchor = F.when(
        (F.col("deg_src") < F.col("deg_dst"))
        | ((F.col("deg_src") == F.col("deg_dst")) & (F.col("src") <= F.col("dst"))),
        F.col("src"),
    ).otherwise(F.col("dst"))
    anchored = edges_dd.withColumn("anchor", anchor)
    if grouping == "range":
        cuts = anchored.approxQuantile("anchor", [i / p for i in range(1, p)], 0.001)
        uniq = sorted(set(cuts))
        grp = F.lit(0).cast("long")
        for c in uniq:  # comparison-sum bucketizer: grp = #cuts below anchor
            grp = grp + (F.col("anchor") > F.lit(float(c))).cast("long")
        return anchored.withColumn("grp", grp)
    return anchored.withColumn(
        "grp", F.pmod(F.xxhash64("anchor", F.lit(7)), F.lit(p))
    )


def _split_ne_local(
    edges_dd: DataFrame, p: int, k: int, grouping: str = "range",
    n_groups: int | None = None,
) -> DataFrame:
    """Locality grouping into n_groups (>= p, default p) groups, then
    per-group NE-lite; group buckets map into the parent slot's k
    sub-buckets (_parent_slot)."""
    n_groups = n_groups or p
    return (
        _locality_grouped(edges_dd, n_groups, grouping)
        .select("grp", "src", "dst")
        .groupBy("grp")
        .applyInPandas(_ne_lite_group(k, p=p, n_groups=n_groups), schema=_NE_SCHEMA)
    )


def fsm_partition(
    edges: DataFrame,
    p: int,
    k: int = 2,
    merge: str = "precise",
    splitter: str = "ne_local",
    hdf: float = DEFAULT_HDF,
    deg: DataFrame | None = None,
    grouping: str = "range",
    merge_stats: str = "auto",
    edges_per_task: int = 20_000_000,
    portable: bool = False,
) -> FsmResult:
    """Full FSM pipeline: split into k*p sub-buckets -> driver greedy merge ->
    broadcast remap.  edges: (src, dst) long, canonical, deduped.

    merge_stats: where union popcounts come from — "driver" collects per-sub
    replica bitmaps (exact, test scale), "joins" keeps all O(n) state
    distributed and feeds the greedy from the pairwise overlap matrix +
    incremental count-distinct joins (the 100-TB path), "auto" switches on
    replica-relation size (DRIVER_BITMAP_THRESHOLD rows).

    edges_per_task bounds split-task memory: the locality split runs over
    n_groups = max(p, ceil(m / edges_per_task)) groups (each an applyInPandas
    task materializing one pandas frame), with contiguous groups sharing a
    parent slot so exactly k*p sub-buckets still feed the merge — at 100 TB
    a group is ~edges_per_task rows, never m/p.

    portable=True (splitter="dbh" only): both hash expressions (sub-bucket
    spread and h2h salt) become ANSI-SQL integer arithmetic so the WHOLE
    pipeline — split, per-sub replica counts, the desc-replica ordering, the
    k=2 fast-merge greedy, and the rearrange remap — is replayed exactly by
    the DuckDB oracle (the greedy at k=2 has a closed form, proven in
    tests/test_kernel_properties.py::test_fast_merge_k2_closed_form)."""
    spark = edges.sparkSession
    n_sub = p * k
    own_deg = deg is None
    if own_deg:
        # persist (not localCheckpoint): the avg-degree aggregate right below
        # is the materializing job, so the degree table costs one job instead
        # of two; both endpoint broadcast joins then read the cache
        deg = degrees_of(edges).persist()
    avg_deg_row = deg.agg(
        F.avg("degree").alias("a"), F.sum("degree").alias("s")
    ).collect()[0]
    high_threshold = hdf * float(avg_deg_row["a"])
    m_edges = int(avg_deg_row["s"]) // 2  # sum of degrees counts each edge twice
    n_groups = max(p, -(-m_edges // max(edges_per_task, 1)))
    degb = F.broadcast(deg)
    e = (
        edges.join(
            degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src"
        ).join(
            degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst"
        )
    )
    # cache the degree-joined relation: the range-grouping quantile job and
    # the split/h2h materialization both consume it — persist() keeps the
    # partition layout (and therefore the approxQuantile sketch and every
    # downstream assignment) bit-identical while halving the join work
    e = e.persist()
    is_h2h = (F.col("deg_src") > high_threshold) & (F.col("deg_dst") > high_threshold)
    low = e.where(~is_h2h)
    h2h = e.where(is_h2h)

    if portable and splitter != "dbh":
        raise ValueError("portable=True requires splitter='dbh'")
    if splitter == "dbh":
        low_assigned = _split_dbh(low, n_sub, portable=portable)
    elif splitter == "ne_local":
        low_assigned = _split_ne_local(low, p, k, grouping=grouping, n_groups=n_groups)
    elif splitter == "hep_local":
        low_assigned = _split_hep_local(
            low, p, k, high_threshold, grouping=grouping, n_groups=n_groups
        )
    else:
        raise ValueError(f"unknown splitter {splitter!r}")
    # hub-hub edges: salt uniformly across all sub-buckets (HEP h2h analog,
    # src/hep_graph.cpp:136-140 + north-star hub sub-vertex splitting).
    # Portable flavor: polynomial integer salt (exact in any BIGINT engine;
    # assumes ids < ~9e12 so src*1000003+dst stays in int64 — oracle scale)
    h2h_hash = (
        F.pmod(F.col("src") * F.lit(1000003) + F.col("dst"), F.lit(n_sub))
        if portable
        else F.pmod(F.xxhash64("src", "dst", F.lit(11)), F.lit(n_sub))
    )
    h2h_assigned = h2h.select("src", "dst", h2h_hash.cast("long").alias("bucket"))
    sub_assigned = low_assigned.unionAll(h2h_assigned)
    # lineage-free materialization: the split phase's plan (degree joins +
    # applyInPandas) would otherwise be re-planned by every downstream job
    sub_assigned = sub_assigned.localCheckpoint(eager=True)
    e.unpersist()
    if own_deg:
        # everything downstream reads sub_assigned only; an internally-built
        # degree table is scratch from here on
        release(deg)

    # --- merge planning stats: only (k·p)-sized aggregates reach the driver
    # unless the bitmap path is explicitly chosen / small enough ---
    reps = None
    if merge_stats in ("auto", "driver") and 2 * m_edges <= DRIVER_BITMAP_THRESHOLD:
        # FUSED small-scale path: replica rows are bounded by 2m, so the
        # bitmap oracle is guaranteed; ONE collected aggregation (bucket,
        # vertex, incident-edge count) yields occupied (= sum(cnt)/2),
        # replica counts (= rows per bucket) AND the membership bitmaps —
        # replacing the former three jobs (per-bucket agg, replica-relation
        # persist, replica toPandas).  Values identical by construction.
        pair_pdf = (
            sub_assigned.select(
                "bucket", F.explode(F.array("src", "dst")).alias("vertex")
            )
            .groupBy("bucket", "vertex")
            .agg(F.count(F.lit(1)).alias("c"))
            .toPandas()
        )
        by_bucket = pair_pdf.groupby("bucket")
        occupied = {old_id: 0 for old_id in range(n_sub)}
        occupied.update({int(b): int(c) // 2 for b, c in by_bucket["c"].sum().items()})
        replicas = {old_id: 0 for old_id in range(n_sub)}
        replicas.update({int(b): int(s) for b, s in by_bucket.size().items()})
        verts = np.unique(pair_pdf["vertex"].to_numpy(np.int64))
        vidx = {int(v): i for i, v in enumerate(verts)}
        members = {int(b): v.to_numpy(np.int64) for b, v in by_bucket["vertex"]}
        bitmaps: dict[int, np.ndarray] = {}
        for old_id in range(n_sub):
            bm = np.zeros(len(verts), dtype=bool)
            mem = members.get(old_id)
            if mem is not None:
                bm[[vidx[int(v)] for v in mem]] = True
            bitmaps[old_id] = bm
        stats = _BitmapMergeStats(replicas, occupied, bitmaps)
    else:
        reps = replica_sets(sub_assigned).persist()
        # ONE fused agg job for both per-bucket edge counts and replica counts
        # (count doubles every edge; countDistinct over endpoints = |V_b|)
        both_rows = (
            sub_assigned.select("bucket", F.explode(F.array("src", "dst")).alias("vertex"))
            .groupBy("bucket")
            .agg(
                (F.count(F.lit(1)) / 2).cast("long").alias("m"),
                F.countDistinct("vertex").alias("r"),
            )
            .collect()
        )
        occupied = {old_id: 0 for old_id in range(n_sub)}
        occupied.update({int(r["bucket"]): int(r["m"]) for r in both_rows})
        replica_counts = {old_id: 0 for old_id in range(n_sub)}
        replica_counts.update({int(r["bucket"]): int(r["r"]) for r in both_rows})
        stats, replicas = build_merge_stats(
            reps, n_sub, occupied, merge_stats, replicas=replica_counts
        )

    # sort desc by replicas, stable (ties by old_id) — fsm_partitioner.cpp:82-85
    order = sorted(range(n_sub), key=lambda b: (-replicas[b], b))

    if merge == "fast":
        valid = fast_merge(order, stats, p, k)
    elif merge == "precise":
        valid = precise_merge(order, stats, p, k)
    else:
        raise ValueError(f"unknown merge {merge!r}")
    if reps is not None:
        release(reps)

    # --- rearrange: old->final remap (fsm_partitioner.hpp:114-129).  Sub-
    # bucket ids are dense in [0, n_sub) by construction, so for any sane
    # n_sub the map is a literal array lookup — a pure projection, no
    # broadcast exchange, no join (measured ~2x faster at sf0.1; outputs
    # verified equal).  A pathological n_sub falls back to the broadcast
    # join to keep codegen small. ---
    if n_sub <= 4096:
        lut = F.array(*[F.lit(int(valid[i])) for i in range(n_sub)])
        assigned = sub_assigned.select(
            "src",
            "dst",
            F.get(lut, F.col("bucket").cast("int")).cast("long").alias("bucket"),
        )
    else:
        map_df = F.broadcast(
            spark.createDataFrame(
                [(int(o), int(nb)) for o, nb in valid.items()], "bucket long, final long"
            )
        )
        assigned = (
            sub_assigned.join(map_df, "bucket")
            .select("src", "dst", F.col("final").alias("bucket"))
        )
    per_final: dict[int, int] = {}
    for _, nb in valid.items():
        per_final[nb] = per_final.get(nb, 0) + 1
    return FsmResult(
        assigned=assigned,
        sub_assigned=sub_assigned,
        merge_map=valid,
        p=p,
        k=k,
        subbuckets_per_final=per_final,
    )
