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
