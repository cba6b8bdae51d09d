"""Planted-fixture tests for the event-lifecycle operators: gap_regularity
(inter-event CV^2 bot signal) and km_survival (Kaplan-Meier time-to-next-
event with right-censoring) — hand-computed exact-integer expectations."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions.events import gap_regularity, km_survival

EPOCH = dt.datetime(2024, 1, 1)


def _events(spark, rows):
    # rows: (event_id, user_id, offset_seconds)
    return spark.createDataFrame(
        [(i, u, EPOCH + dt.timedelta(seconds=s)) for i, u, s in rows],
        "event_id long, user_id long, ts timestamp_ntz",
    )


def test_gap_regularity_bot_vs_human(spark):
    rows = []
    # user 1: bot — 5 events exactly 60 s apart -> 4 gaps, var 0, cv2 0
    rows += [(i, 1, 60 * i) for i in range(5)]
    # user 2: human — gaps 10, 20, 60, 110 s
    off = [0, 10, 30, 90, 200]
    rows += [(10 + i, 2, s) for i, s in enumerate(off)]
    # user 3: too short (2 events = 1 gap < min_gaps)
    rows += [(20, 3, 0), (21, 3, 7)]
    out = {r["user_id"]: r for r in gap_regularity(_events(spark, rows)).collect()}
    assert set(out) == {1, 2}
    bot = out[1]
    assert (bot["n_gaps"], bot["cv2_ppm"], bot["is_regular"]) == (4, 0, True)
    assert bot["mean_gap_us"] == 60_000_000
    hum = out[2]
    # Sx = 200e6 us, Sxx = 16200e12, varnum = 4*Sxx - Sx^2 = 2.48e16,
    # cv2_ppm = 1e6 * 2.48e16 // 4e16 = 620000
    assert (hum["n_gaps"], hum["cv2_ppm"], hum["is_regular"]) == (4, 620_000, False)
    assert (hum["min_gap_us"], hum["max_gap_us"]) == (10_000_000, 110_000_000)


def test_gap_regularity_ties_and_zero_sum(spark):
    # user with all events at the SAME microsecond: gaps all 0, Sx = 0 ->
    # declared perfectly regular (cv2 0), ordering tie-broken by event_id
    rows = [(i, 9, 0) for i in range(6)]
    out = gap_regularity(_events(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_gaps"], r["sum_gap_us"] if "sum_gap_us" in r else 0, r["cv2_ppm"],
            r["is_regular"])[2:] == (0, True)


def test_km_survival_hand_curve(spark):
    h = 3600
    rows = [
        # user 1: events at hours 0, 1, 2 -> observed gaps 1h, 1h
        (1, 1, 0), (2, 1, h), (3, 1, 2 * h),
        # user 2: events at hours 0, 10 -> observed gap 10h; horizon = 10h
        (4, 2, 0), (5, 2, 10 * h),
    ]
    out = {r["duration_unit"]: r for r in km_survival(_events(spark, rows)).collect()}
    # observations: observed {1: x2, 10: x1}; censored tails {8 (user1), 0 (user2)}
    assert set(out) == {0, 1, 8, 10}
    assert (out[0]["n_at_risk"], out[0]["n_events"], out[0]["n_censored"],
            out[0]["survival_ppm"]) == (5, 0, 1, 1_000_000)
    assert (out[1]["n_at_risk"], out[1]["n_events"], out[1]["survival_ppm"]) == (
        4, 2, 500_000)
    assert (out[8]["n_at_risk"], out[8]["n_censored"], out[8]["survival_ppm"]) == (
        2, 1, 500_000)
    assert (out[10]["n_at_risk"], out[10]["n_events"], out[10]["survival_ppm"]) == (
        1, 1, 0)


def test_km_survival_monotone_and_conserved(spark):
    # random-ish deterministic stream: survival_ppm non-increasing, at-risk
    # counts telescope, every observation accounted once
    rows = [(i, i % 7, ((i * 37) % 500) * 60) for i in range(200)]
    df = km_survival(_events(spark, rows)).orderBy("duration_unit").collect()
    s_prev = 1_000_000
    for r in df:
        assert r["survival_ppm"] <= s_prev
        s_prev = r["survival_ppm"]
    total_obs = sum(r["n_events"] + r["n_censored"] for r in df)
    assert df[0]["n_at_risk"] == total_obs  # first row sees every observation


def test_burst_stats_sliding_vs_tumbling(spark):
    from split_merge_partitioner_spark.functions.events import burst_stats

    # 6 events straddling an hour boundary 30 min apart each side: a
    # trailing 1h window sees 4 together; 1h tumbling buckets would see 3
    rows = [(i, 1, 3000 + i * 600) for i in range(6)]
    # and a quiet user
    rows += [(10, 2, 0), (11, 2, 50)]
    out = {r.user_id: r for r in
           burst_stats(_events(spark, rows), burst_threshold=5).collect()}
    assert out[1].peak_burst == 6  # 6 events in 3000..6000s all within 1h
    assert out[2].peak_burst == 2 and not out[2].is_burst
    # tight window: 10-minute trailing window sees at most 2
    out2 = {r.user_id: r for r in
            burst_stats(_events(spark, rows), window_us=600_000_000,
                        burst_threshold=1).collect()}
    assert out2[1].peak_burst == 2 and out2[1].is_burst
