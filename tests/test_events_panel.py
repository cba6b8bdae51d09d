"""Unit tests: rolling_user_activity, rfm_segments, outlier_events
(functions/events.py) — hand-computed expectations."""

from __future__ import annotations

import datetime as dt

from split_merge_partitioner_spark.functions.events import (
    outlier_events,
    rfm_segments,
    rolling_user_activity,
)


def _ts(day: int, hour: int = 0):
    return dt.datetime(2024, 1, 1) + dt.timedelta(days=day, hours=hour)


def test_rolling_activity_hand_computed(spark):
    # user 1: days 0,1,8 (window 7 → day 8 sees only itself);
    # user 2: two events on day 0
    rows = [
        (1, 1, _ts(0), "view", 1.0),
        (2, 1, _ts(1), "view", 2.0),
        (3, 1, _ts(8), "view", 4.0),
        (4, 2, _ts(0), "view", 0.5),
        (5, 2, _ts(0, 6), "view", 0.25),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["user_id"], r["day"] - 19723): r  # 2024-01-01 = epoch day 19723
        for r in rolling_user_activity(ev, window_days=7).collect()
    }
    assert out[(1, 0)]["n_events_rolling"] == 1
    assert out[(1, 1)]["n_events_rolling"] == 2
    assert out[(1, 1)]["value_micros_rolling"] == 3_000_000
    assert out[(1, 8)]["n_events_rolling"] == 1  # day 1 is 7 days back, outside
    assert out[(2, 0)]["n_events"] == 2
    assert out[(2, 0)]["value_micros_rolling"] == 750_000


def test_rfm_segments_tiling(spark):
    # 4 users with strictly ordered metrics → each lands in its own quartile
    rows = []
    eid = 0
    for u, (rec_day, freq, val) in enumerate(
        [(10, 8, 100.0), (8, 6, 50.0), (6, 4, 20.0), (4, 2, 5.0)], start=1
    ):
        for i in range(freq):
            eid += 1
            rows.append((eid, u, _ts(rec_day - (i % 2)), "view", val))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = {r["user_id"]: r for r in rfm_segments(ev).collect()}
    assert [out[u]["r_tile"] for u in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[u]["f_tile"] for u in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert [out[u]["m_tile"] for u in (1, 2, 3, 4)] == [1, 2, 3, 4]
    assert out[1]["segment"] == 111 and out[4]["segment"] == 444
    assert out[1]["frequency"] == 8
    assert out[1]["monetary_micros"] == 8 * 100_000_000


def test_outlier_events_flags_known_spike(spark):
    # group A: 20 values of 1.0 plus one 100.0 → the spike is >3 sigma;
    # group B: constant values → zero variance, nothing flagged
    rows = [(i, 1, _ts(0), "A", 1.0) for i in range(20)]
    rows.append((99, 1, _ts(0), "A", 100.0))
    rows += [(200 + i, 2, _ts(0), "B", 7.0) for i in range(10)]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string, value double"
    )
    out = outlier_events(ev, k_sigma=3).collect()
    assert [r["event_id"] for r in out] == [99]
    r = out[0]
    assert r["value_milli"] == 100_000
    # dev = n*x - Sx = 21*100000 - (20*1000 + 100000)
    assert r["dev_scaled"] == 21 * 100_000 - 120_000


def test_outlier_events_singleton_group_never_flagged(spark):
    ev = spark.createDataFrame(
        [(1, 1, _ts(0), "solo", 42.0)],
        "event_id long, user_id long, ts timestamp, event_type string, value double",
    )
    assert outlier_events(ev).count() == 0


def test_gap_fill_daily_locf(spark):
    """Dense spine + LOCF on a planted 3-active-day user (+1 single-day)."""
    import pandas as pd

    from split_merge_partitioner_spark.functions.events import gap_fill_daily

    rows = []
    base = pd.Timestamp("2024-01-01 06:00:00")
    for day, cnt in [(0, 2), (3, 1), (4, 3)]:
        for j in range(cnt):
            rows.append({"user_id": 1, "ts": base + pd.Timedelta(days=day, hours=j)})
    rows.append({"user_id": 2, "ts": base})
    got = (
        gap_fill_daily(spark.createDataFrame(pd.DataFrame(rows)))
        .orderBy("user_id", "day")
        .collect()
    )
    u1 = [(r.day - got[0].day, r.n_obs, r.filled, r.days_since_obs)
          for r in got if r.user_id == 1]
    assert u1 == [
        (0, 2, 2, 0),
        (1, 0, 2, 1),
        (2, 0, 2, 2),
        (3, 1, 1, 0),
        (4, 3, 3, 0),
    ]
    u2 = [r for r in got if r.user_id == 2]
    assert len(u2) == 1 and u2[0].n_obs == 1 and u2[0].days_since_obs == 0
