"""Skew report: hand-checked shares, rank determinism under ties."""

from __future__ import annotations

from split_merge_partitioner_spark.functions.profiling import skew_report


def test_skew_report_hand_values(spark):
    rows = [("hub",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    got = {r.rank: r for r in skew_report(df, "k", top_k=3).collect()}
    assert [got[i].key for i in (1, 2, 3)] == ["hub", "warm", "a"]  # tie a<b
    assert got[1].share_ppm == 600_000 and got[1].cum_share_ppm == 600_000
    assert got[2].cum_share_ppm == 900_000
    assert got[3].share_ppm == 50_000 and got[3].cum_share_ppm == 950_000
    assert got[1].rows_total == 100 and got[1].n_keys_total == 4


def test_skew_report_deterministic_under_repartition(spark):
    rows = [(f"k{i % 7}",) for i in range(200)]
    df = spark.createDataFrame(rows, "k string")
    a = sorted(map(tuple, skew_report(df.repartition(13), "k").collect()))
    b = sorted(map(tuple, skew_report(df.coalesce(1), "k").collect()))
    assert a == b
