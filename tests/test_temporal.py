"""Temporal reachability: earliest time-respecting arrival windows must
match a naive per-bucket fixpoint replay; information must never flow
backward in time; seeds report arrival 0."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import temporal_reachability

_T0 = datetime(2024, 1, 1)
_WINDOW_S = 10


def _ev(rows):
    """rows of (user, event_type, window_offset) -> events tuples; the event
    lands in absolute window base+offset (ts = _T0 + offset windows)."""
    out = []
    for i, (u, et, wo) in enumerate(rows):
        out.append((i, _T0 + timedelta(seconds=wo * _WINDOW_S + 1), u, et))
    return out


def _events_df(spark, rows):
    return spark.createDataFrame(
        _ev(rows), "event_id long, ts timestamp_ntz, user_id long, event_type string"
    )


def _base_window():
    epoch_us = int((_T0 - datetime(1970, 1, 1)).total_seconds() * 1_000_000)
    return epoch_us // (_WINDOW_S * 1_000_000)


def _replay(rows, seeds):
    """Naive fixpoint over bucket occurrences with the w >= arrival rule."""
    base = _base_window()
    buckets = {}
    for u, et, wo in rows:
        buckets.setdefault((et, base + wo), set()).add(u)
    arr = {int(s): 0 for s in seeds}
    changed = True
    while changed:
        changed = False
        for (et, w), members in buckets.items():
            if any(u in arr and arr[u] <= w for u in members):
                for v in members:
                    if v not in arr or arr[v] > w:
                        arr[v] = w
                        changed = True
    return arr


def _got(df):
    return {r.user_id: r.arrival_win for r in df.collect()}


def test_time_respecting_not_static_reachability(spark):
    # contact C-D happens at window 5; C is only infected at window 9 (via
    # B), so D must NOT be reached even though the static contact graph
    # connects seed->A->...->D
    rows = [
        (1, "x", 2), (2, "x", 2),          # seed 1 meets 2 at w+2
        (2, "y", 9), (3, "y", 9),          # 2 meets 3 at w+9
        (3, "z", 5), (4, "z", 5),          # 3 meets 4 at w+5 — BEFORE 3 infected
    ]
    out, info = temporal_reachability(
        _events_df(spark, rows), seeds=[1], window_seconds=_WINDOW_S
    )
    got = _got(out)
    base = _base_window()
    assert got == {1: 0, 2: base + 2, 3: base + 9}
    assert 4 not in got
    assert info["converged"]


def test_matches_naive_fixpoint_random(spark):
    rng = np.random.default_rng(8)
    rows = [
        (int(rng.integers(0, 30)), f"t{int(rng.integers(0, 4))}",
         int(rng.integers(0, 12)))
        for _ in range(160)
    ]
    seeds = [0, 7]
    out, _ = temporal_reachability(
        _events_df(spark, rows), seeds=seeds, window_seconds=_WINDOW_S
    )
    assert _got(out) == _replay(rows, seeds)


def test_same_window_chain_and_seed_zero(spark):
    # 1 meets 2 in bucket (x, w); 2 meets 3 in a DIFFERENT bucket (y, w) at
    # the SAME window — the inclusive w >= arrival rule lets the chain
    # complete within one window (over two supersteps)
    rows = [(1, "x", 3), (2, "x", 3), (2, "y", 3), (3, "y", 3)]
    out, _ = temporal_reachability(
        _events_df(spark, rows), seeds=[1], window_seconds=_WINDOW_S
    )
    got = _got(out)
    base = _base_window()
    assert got == {1: 0, 2: base + 3, 3: base + 3}


def test_seed_without_events_and_validation(spark):
    rows = [(5, "x", 1), (6, "x", 1)]
    df = _events_df(spark, rows)
    out, _ = temporal_reachability(df, seeds=[99], window_seconds=_WINDOW_S)
    assert _got(out) == {99: 0}
    with pytest.raises(ValueError):
        temporal_reachability(df, seeds=[])
    with pytest.raises(ValueError):
        temporal_reachability(df, seeds=[1], window_seconds=0)


def test_deterministic_under_repartition(spark):
    rng = np.random.default_rng(3)
    rows = [
        (int(rng.integers(0, 20)), f"t{int(rng.integers(0, 3))}",
         int(rng.integers(0, 8)))
        for _ in range(100)
    ]
    df = _events_df(spark, rows)
    a, _ = temporal_reachability(df, seeds=[2], window_seconds=_WINDOW_S)
    b, _ = temporal_reachability(
        df.repartition(11), seeds=[2], window_seconds=_WINDOW_S
    )
    assert _got(a) == _got(b)
