"""Property-based invariants (hypothesis) for the driver-side kernels — no
Spark session needed, so hundreds of random graphs are cheap.

Properties mirror the reference CHECK suite (SURVEY.md §5): every edge
assigned exactly once to an in-range bucket, merge maps are total with the
k-cap respected, and the two merge-stat oracles are interchangeable."""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from split_merge_partitioner_spark.operators.fsm import (
    _BitmapMergeStats,
    _FinalIds,
    _hep_lite_group,
    _ne_lite_group,
    fast_merge,
    precise_merge,
)
from split_merge_partitioner_spark.operators.hybridbl import _hybridbl_group


@st.composite
def edge_sets(draw):
    n = draw(st.integers(min_value=2, max_value=60))
    m = draw(st.integers(min_value=1, max_value=200))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    src = rng.integers(0, n, m)
    dst = rng.integers(0, n, m)
    keep = src != dst
    if not keep.any():
        src, dst = np.array([0]), np.array([1])
    else:
        src, dst = src[keep], dst[keep]
    lo, hi = np.minimum(src, dst), np.maximum(src, dst)
    pdf = pd.DataFrame({"src": lo, "dst": hi}).drop_duplicates().reset_index(drop=True)
    return pdf


def _degrees(pdf):
    deg = np.bincount(
        np.concatenate([pdf.src.to_numpy(), pdf.dst.to_numpy()]).astype(np.int64)
    )
    return deg


@given(edge_sets(), st.integers(min_value=1, max_value=6))
@settings(max_examples=60, deadline=None)
def test_ne_kernel_invariants(pdf, k):
    out = _ne_lite_group(k)((3,), pdf)
    assert len(out) == len(pdf)  # conservation
    assert ((out.bucket >= 3 * k) & (out.bucket < 4 * k)).all()  # group range
    # capacity: buckets 0..k-2 bounded by cap + core-edge overshoot <= m
    assert out.bucket.notna().all()


@given(edge_sets(), st.integers(min_value=1, max_value=6),
       st.floats(min_value=1.0, max_value=50.0))
@settings(max_examples=60, deadline=None)
def test_hep_kernel_invariants(pdf, k, hdf):
    deg = _degrees(pdf)
    pdf = pdf.assign(
        deg_src=deg[pdf.src.to_numpy()].astype(float),
        deg_dst=deg[pdf.dst.to_numpy()].astype(float),
    )
    avg = deg[deg > 0].mean()
    out = _hep_lite_group(k, hdf * avg)((0,), pdf)
    assert len(out) == len(pdf)
    assert ((out.bucket >= 0) & (out.bucket < k)).all()


@given(edge_sets(), st.integers(min_value=1, max_value=5))
@settings(max_examples=40, deadline=None)
def test_hybridbl_kernel_invariants(pdf, p):
    deg = _degrees(pdf)
    pdf = pdf.assign(
        deg_src=deg[pdf.src.to_numpy()].astype(float),
        deg_dst=deg[pdf.dst.to_numpy()].astype(float),
    )
    out = _hybridbl_group(p, degree_threshold=deg.mean() * 2, gamma=3)((0,), pdf)
    assert len(out) == len(pdf)
    assert ((out.bucket >= 0) & (out.bucket < p)).all()


@st.composite
def merge_instances(draw):
    p = draw(st.integers(min_value=1, max_value=6))
    k = draw(st.integers(min_value=1, max_value=4))
    n = draw(st.integers(min_value=1, max_value=40))
    rng = np.random.default_rng(draw(st.integers(0, 2**31)))
    n_sub = p * k
    bitmaps = {b: rng.random(n) < rng.random() for b in range(n_sub)}
    occupied = {b: int(rng.integers(0, 100)) for b in range(n_sub)}
    return p, k, bitmaps, occupied


@given(merge_instances(), st.sampled_from(["fast", "precise"]))
@settings(max_examples=80, deadline=None)
def test_merge_properties(inst, which):
    p, k, bitmaps, occupied = inst
    n_sub = p * k
    replicas = {b: int(bm.sum()) for b, bm in bitmaps.items()}
    stats = _BitmapMergeStats(replicas, occupied, {b: bm.copy() for b, bm in bitmaps.items()})
    order = sorted(range(n_sub), key=lambda b: (-replicas[b], b))
    merge = fast_merge if which == "fast" else precise_merge
    valid = merge(order, stats, p, k)
    # total map over all sub-buckets
    assert set(valid.keys()) == set(range(n_sub))
    # k-cap per final bucket and contiguous final ids 0..p-1
    counts: dict[int, int] = {}
    for b, f in valid.items():
        counts[f] = counts.get(f, 0) + 1
    assert all(c <= k for c in counts.values())
    assert set(valid.values()) == set(range(p))
    # deterministic: same inputs -> same map
    stats2 = _BitmapMergeStats(replicas, occupied, {b: bm.copy() for b, bm in bitmaps.items()})
    assert merge(order, stats2, p, k) == valid


def test_final_ids_sequential():
    f = _FinalIds()
    assert [f.get(9), f.get(4), f.get(9), f.get(1)] == [0, 1, 0, 2]


def _fast_merge_k2_closed_form(replicas: dict[int, int], p: int) -> dict[int, int]:
    """The window-function form of fast_merge at k=2, exactly as the DuckDB
    oracle (__spark_entry__ "fsm_assign_portable") replays it:

    - rank all 2p sub-buckets by (replicas desc, id asc) -> pos 0..2p-1
    - the first p open parents sequentially: final id = pos (heap invariant:
      empty slots (0,0,b) sort before every opened parent (size,1,b))
    - at k=2 an absorb retires its parent, so open-parent PQ keys never
      change: joiner at pos p+j pairs with the j-th opener in
      (replicas asc, pos asc) order."""
    n_sub = 2 * p
    order = sorted(range(n_sub), key=lambda b: (-replicas[b], b))
    opener_by_minsize = sorted(range(p), key=lambda i: (replicas[order[i]], i))
    valid = {sub: i for i, sub in enumerate(order[:p])}
    for j, sub in enumerate(order[p:]):
        valid[sub] = opener_by_minsize[j]
    return valid


class _ReplicaOnlyStats:
    """Minimal merge-stat oracle: at k=2 fast_merge consults only
    new_parent's return (the sub's replica count) — absorb retires."""

    def __init__(self, replicas):
        self._replicas = replicas

    def replicas(self, sub):
        return self._replicas[sub]

    def new_parent(self, key, sub):
        return self._replicas[sub]

    def absorb(self, key, sub, retire=False):
        assert retire, "k=2: every absorb must retire its parent"
        return 0


@given(
    st.integers(min_value=1, max_value=16),
    st.lists(st.integers(min_value=0, max_value=12), min_size=2, max_size=32),
    st.integers(0, 2**31),
)
@settings(max_examples=200, deadline=None)
def test_fast_merge_k2_closed_form(p, _unused, seed):
    """fast_merge at k=2 == the closed form the SQL oracle uses.  Small value
    range forces heavy replica-count TIES (the tricky tie-break paths)."""
    rng = np.random.default_rng(seed)
    replicas = {b: int(rng.integers(0, 12)) for b in range(2 * p)}
    order = sorted(range(2 * p), key=lambda b: (-replicas[b], b))
    got = fast_merge(order, _ReplicaOnlyStats(replicas), p, 2)
    assert got == _fast_merge_k2_closed_form(replicas, p)
