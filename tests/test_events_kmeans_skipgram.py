"""Hand-computed fixtures for the round-5 operators: sessionize, asof_latest
(functions/events.py), segment_dedup (functions/dedup.py), kmeans_assign /
kmeans_update (functions/kmeans.py), skipgram_pairs (functions/text.py).

The sf-scale cross-engine hash checks live in the driver contract
(tests/test_entry_contract.py + CORRECTNESS_r*.json); these tests pin the
SEMANTICS on inputs small enough to verify by hand — boundary-gap ties,
equal-timestamp as-of matches, keep-first ordering, argmin tie-breaks."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions.dedup import segment_dedup
from split_merge_partitioner_spark.functions.events import asof_latest, sessionize
from split_merge_partitioner_spark.functions.kmeans import kmeans_assign, kmeans_update
from split_merge_partitioner_spark.functions.text import skipgram_pairs

TS = "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute, 0)


def test_sessionize_gap_boundaries(spark):
    # gap = 60 s: a gap of EXACTLY 60 s does NOT split (strictly greater);
    # 61 s does.  user 2: single event -> one 1-event session.
    rows = [
        (1, _ts(0), 1, "view", 1.0),
        (2, dt.datetime(2024, 1, 1, 0, 1, 0), 1, "view", 2.0),    # +60s  same
        (3, dt.datetime(2024, 1, 1, 0, 2, 1), 1, "view", 3.0),    # +61s  NEW
        (4, dt.datetime(2024, 1, 1, 0, 2, 30), 1, "view", 0.5),   # +29s  same
        (5, _ts(10), 2, "view", 9.0),
    ]
    out = sessionize(
        spark.createDataFrame(rows, TS), gap_seconds=60
    ).orderBy("user_id", "session_id").collect()
    assert [(r.user_id, r.session_id, r.n_events) for r in out] == [
        (1, 1, 2), (1, 2, 2), (2, 1, 1),
    ]
    s11, s12, s2 = out
    assert s11.duration_us == 60_000_000
    assert s12.duration_us == 29_000_000
    assert s2.duration_us == 0
    assert s11.value_micros_sum == 3_000_000
    assert s12.value_micros_sum == 3_500_000


def test_sessionize_orders_by_ts_not_event_id(spark):
    # event ids arrive out of time order; sessions follow ts
    rows = [
        (9, _ts(0), 1, "view", 0.0),
        (1, _ts(30), 1, "view", 0.0),  # 30 min later -> new session (gap 60s)
    ]
    out = sessionize(spark.createDataFrame(rows, TS), gap_seconds=60).collect()
    assert sorted((r.session_id, r.n_events) for r in out) == [(1, 1), (2, 1)]


def test_asof_latest_semantics(spark):
    rows = [
        (1, _ts(0), 1, "click", 10.0),
        (2, _ts(5), 1, "purchase", 1.0),   # matches click 1
        (3, _ts(5), 1, "click", 20.0),     # SAME ts as purchase 2? no - ts(5) too
        (4, _ts(9), 1, "purchase", 2.0),   # matches click 3 (most recent)
        (5, _ts(1), 2, "purchase", 3.0),   # user 2: no prior click -> NULL
    ]
    out = {r.event_id: r for r in asof_latest(
        spark.createDataFrame(rows, TS), "purchase", "click"
    ).collect()}
    # purchase 2 at ts(5): click 3 shares ts(5) and equal-ts rights MATCH
    assert out[2].matched_event_id == 3
    assert out[4].matched_event_id == 3
    assert out[4].matched_value_micros == 20_000_000
    assert out[5].matched_event_id is None
    assert out[5].matched_ts_us is None


def test_asof_equal_ts_largest_right_wins(spark):
    rows = [
        (1, _ts(0), 1, "click", 1.0),
        (7, _ts(0), 1, "click", 7.0),     # equal ts: larger event_id wins
        (9, _ts(0), 1, "purchase", 0.0),
    ]
    out = asof_latest(spark.createDataFrame(rows, TS), "purchase", "click").collect()
    assert len(out) == 1 and out[0].matched_event_id == 7


DOCS = "doc_id long, text string"


def test_segment_dedup_keep_first_and_reassembly(spark):
    # block size 16: doc 0's two blocks; doc 1 repeats doc 0's FIRST block
    # exactly and adds a fresh remainder; doc 2 is the empty document
    b0 = " ".join(f"w{i}" for i in range(16))
    b1 = " ".join(f"x{i}" for i in range(4))
    rows = [(0, f"{b0} {b1}"), (1, f"{b0} fresh tail"), (2, "   ")]
    out = {r.doc_id: r for r in segment_dedup(
        spark.createDataFrame(rows, DOCS)
    ).collect()}
    assert (out[0].n_blocks, out[0].n_kept) == (2, 2)
    assert out[0].text_kept == f"{b0} {b1}"
    # doc 1: first block is a corpus-wide repeat of (0, 0) -> dropped
    assert (out[1].n_blocks, out[1].n_kept) == (2, 1)
    assert out[1].text_kept == "fresh tail"
    assert (out[2].n_blocks, out[2].n_kept, out[2].text_kept) == (0, 0, "")


def test_segment_dedup_within_doc_repeat(spark):
    # the SAME 16-token block twice within one document: second drops
    b = " ".join(f"t{i}" for i in range(16))
    out = segment_dedup(spark.createDataFrame([(5, f"{b} {b}")], DOCS)).collect()[0]
    assert (out.n_blocks, out.n_kept, out.text_kept) == (2, 1, b)


EMB = "vec_id long, embedding array<float>"


def test_kmeans_assign_nearest_and_tie(spark):
    rows = [
        (0, [0.0, 0.0]),   # centroid 0
        (1, [10.0, 0.0]),  # centroid 1
        (2, [1.0, 0.0]),   # -> c0 (dist 1e6 vs 81e6)
        (3, [9.0, 0.0]),   # -> c1
        (4, [5.0, 0.0]),   # EQUIDISTANT -> smaller cid (0)
    ]
    out = {r.vec_id: r for r in kmeans_assign(
        spark.createDataFrame(rows, EMB), k=2
    ).collect()}
    assert out[0].cid == 0 and out[0].dist == 0
    assert out[2].cid == 0 and out[2].dist == 1000 * 1000
    assert out[3].cid == 1
    assert out[4].cid == 0  # tie-break: smallest centroid id


def test_kmeans_update_numerators(spark):
    rows = [(0, [0.0, 0.0]), (1, [10.0, 0.0]), (2, [2.0, 2.0])]
    out = {(r.cid, r.dim_idx): r for r in kmeans_update(
        spark.createDataFrame(rows, EMB), k=2
    ).collect()}
    # cluster 0 = {0, 2}: sums (0+2000, 0+2000), n=2; cluster 1 = {1}
    assert out[(0, 1)].n_members == 2 and out[(0, 1)].sum_q == 2000
    assert out[(0, 2)].sum_q == 2000
    assert out[(1, 1)].n_members == 1 and out[(1, 1)].sum_q == 10000


def test_kmeans_k_exceeds_n_raises(spark):
    with pytest.raises(ValueError, match="centroids requested"):
        kmeans_assign(spark.createDataFrame([(0, [1.0])], EMB), k=2).collect()


def test_skipgram_pairs_hand_counted(spark):
    # "a b a": window 1 -> (a,b) x2, (b,a) x2; window 2 adds (a,a) both ways
    docs = spark.createDataFrame([(0, "a b a")], DOCS)
    w1 = {(r.center, r.context): r.n_pairs
          for r in skipgram_pairs(docs, window=1, min_count=1).collect()}
    assert w1 == {("a", "b"): 2, ("b", "a"): 2}
    w2 = {(r.center, r.context): r.n_pairs
          for r in skipgram_pairs(docs, window=2, min_count=1).collect()}
    assert w2 == {("a", "b"): 2, ("b", "a"): 2, ("a", "a"): 2}


def test_skipgram_empty_and_single_token_docs(spark):
    docs = spark.createDataFrame([(0, "  "), (1, "only")], DOCS)
    assert skipgram_pairs(docs, window=3, min_count=1).count() == 0


def test_skipgram_symmetry(spark):
    # corpus-level symmetry: count(a,b) == count(b,a) by construction
    docs = spark.createDataFrame(
        [(0, "p q r s p q"), (1, "r p p q")], DOCS
    )
    out = skipgram_pairs(docs, window=3, min_count=1)
    sym = out.alias("x").join(
        out.alias("y"),
        (F.col("x.center") == F.col("y.context"))
        & (F.col("x.context") == F.col("y.center")),
    ).where(F.col("x.n_pairs") != F.col("y.n_pairs"))
    assert sym.count() == 0


def test_rarity_stats_hand_computed(spark):
    from split_merge_partitioner_spark.functions.text import rarity_stats

    # vocab: "a" in all 3 docs (df=3), "b" in 2, "z" in 1 (hapax)
    docs = spark.createDataFrame(
        [(0, "a b"), (1, "a b z"), (2, "a a"), (3, "  ")], DOCS
    )
    out = {r.doc_id: r for r in rarity_stats(docs).collect()}
    assert out[0].n_tokens == 2 and out[0].mean_token_df == 2.5       # (3+2)/2
    assert out[1].mean_token_df == 2.0                                 # (3+2+1)/3
    assert out[1].hapax_frac == round(1 / 3, 6)
    assert out[2].mean_token_df == 3.0 and out[2].hapax_frac == 0.0
    assert (out[3].n_tokens, out[3].mean_token_df, out[3].hapax_frac) == (0, 0.0, 0.0)


def test_numeric_profile_discrete_percentiles(spark):
    from split_merge_partitioner_spark.functions.profiling import numeric_profile

    import pytest as _pytest

    rows = [(i, f"g", float(i)) for i in range(1, 11)]  # values 1..10
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    r = numeric_profile(df).collect()[0]
    assert (r.n, r.min_q, r.max_q) == (10, 1_000_000, 10_000_000)
    # discrete: p50 = value at rank ceil(.5*10)=5 -> 5e6; p90 -> rank 9;
    # p99 -> rank ceil(9.9)=10
    assert r.p50_q == 5_000_000
    assert r.p90_q == 9_000_000
    assert r.p99_q == 10_000_000
    with _pytest.raises(ValueError):
        numeric_profile(df, percentiles=(0.0,))


def test_kmeans_train_converges_and_moves_centroids(spark):
    from split_merge_partitioner_spark.functions.kmeans import (
        kmeans_assign,
        kmeans_train,
    )

    # two tight clusters far apart; seeds (two smallest ids) both start in
    # cluster A, so iteration 1 must MOVE a centroid into cluster B
    rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.5, 0.5]),
            (3, [100.0, 100.0]), (4, [101.0, 100.0]), (5, [100.0, 101.0])]
    emb = spark.createDataFrame(rows, EMB)
    first = {r.vec_id: r.cid for r in kmeans_assign(emb, k=2).collect()}
    trained = {r.vec_id: r.cid for r in kmeans_train(emb, k=2, n_iter=3).collect()}
    # seeds are 0 and 1: initially the far cluster all lands on centroid 1
    assert {first[3], first[4], first[5]} == {1}
    # after Lloyd steps the split is the true 2-clustering
    assert trained[0] == trained[1] == trained[2]
    assert trained[3] == trained[4] == trained[5]
    assert trained[0] != trained[3]
    # n_iter=1 is exactly the seed assignment
    once = {r.vec_id: r.cid for r in kmeans_train(emb, k=2, n_iter=1).collect()}
    assert once == first
    with pytest.raises(ValueError):
        kmeans_train(emb, k=2, n_iter=0)


def test_range_join_matches_bruteforce(spark):
    """range_join vs a brute-force containment scan, with overlapping
    intervals, an equality key, and boundary semantics (start inclusive,
    end exclusive) exercised at bucket edges."""
    import datetime as dt

    from split_merge_partitioner_spark.functions.events import range_join

    base = dt.datetime(2024, 1, 1)
    evs = [
        (i, "a" if i % 2 == 0 else "b", base + dt.timedelta(minutes=17 * i))
        for i in range(120)
    ]
    ev = spark.createDataFrame(evs, "event_id long, key string, ts timestamp_ntz")
    base_us = 1_704_067_200_000_000
    ivs = [
        (j, "a" if j % 3 == 0 else "b",
         base_us + j * 1_800_000_000,                 # 30-min stride
         base_us + j * 1_800_000_000 + 3_600_000_000)  # 60-min span (overlap)
        for j in range(40)
    ]
    iv = spark.createDataFrame(ivs, "iv_id long, key string, start_us long, end_us long")
    got = sorted(
        (r["event_id"], r["iv_id"])
        for r in range_join(ev, iv, on="key", bucket_us=900_000_000).collect()
    )
    # naive-epoch arithmetic (not .timestamp(), which is tz-dependent)
    exp = sorted(
        (e_id, j_id)
        for e_id, ek, ts in evs
        for j_id, jk, s_us, e_us in ivs
        if ek == jk
        and s_us <= int((ts - dt.datetime(1970, 1, 1)).total_seconds() * 1e6) < e_us
    )
    assert got == exp and len(got) > 0


def test_range_join_validates(spark):
    import pytest as _pytest

    from split_merge_partitioner_spark.functions.events import range_join

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00")], "event_id long, ts string"
    ).selectExpr("event_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts")
    bad = spark.createDataFrame(
        [(1, 100, 100)], "iv_id long, start_us long, end_us long"
    )
    with _pytest.raises(ValueError):
        range_join(ev, bad)
    too_long = spark.createDataFrame(
        [(1, 0, 10**15)], "iv_id long, start_us long, end_us long"
    )
    with _pytest.raises(ValueError):
        range_join(ev, too_long, max_buckets_per_interval=8)


def test_funnel_hand_values(spark):
    import datetime as dt

    from split_merge_partitioner_spark.functions.events import funnel

    t0 = dt.datetime(2024, 1, 1)

    def ts(h):
        return t0 + dt.timedelta(hours=h)

    rows = [
        # u1 completes in order
        (1, ts(0), "view"), (1, ts(1), "click"), (1, ts(2), "purchase"),
        # u2: its only click is BEFORE its view -> stalls at stage 1
        (2, ts(0), "click"), (2, ts(1), "view"), (2, ts(2), "purchase"),
        # u3: view then purchase only (no click) -> stage 1, no skipping
        (3, ts(0), "view"), (3, ts(5), "purchase"),
        # u4: completes but outside the 3h window
        (4, ts(0), "view"), (4, ts(1), "click"), (4, ts(10), "purchase"),
        # u5: never views -> omitted
        (5, ts(0), "click"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts timestamp_ntz, event_type string"
    )
    got = {
        r["user_id"]: (r["steps_completed"], r["t_last_us"] - r["t_first_us"])
        for r in funnel(
            ev, ["view", "click", "purchase"], within_seconds=3 * 3600
        ).collect()
    }
    h = 3_600_000_000
    assert got == {1: (3, 2 * h), 2: (1, 0), 3: (1, 0), 4: (2, 1 * h)}
    # unwindowed: u4 completes; u2 still stalls (no click after its view)
    got2 = {
        r["user_id"]: r["steps_completed"]
        for r in funnel(ev, ["view", "click", "purchase"]).collect()
    }
    assert got2 == {1: 3, 2: 1, 3: 1, 4: 3}


def test_retention_cohorts_hand_values(spark):
    import datetime as dt

    from split_merge_partitioner_spark.functions.events import retention_cohorts

    day = dt.timedelta(days=1)
    w0 = dt.datetime(2024, 1, 1)  # epoch day 19723 -> period 2817 (div 7)
    rows = [
        # u1: cohort week W, active weeks W, W+1, W+2
        (1, 1, w0),
        (2, 1, w0 + 8 * day),
        (3, 1, w0 + 15 * day),
        (4, 1, w0 + 15 * day + day),  # same period as row above: 1 distinct
        # u2: cohort W, active W only (two events, one distinct period)
        (5, 2, w0 + 1 * day),
        (6, 2, w0 + 2 * day),
        # u3: cohort W+1, active W+1 and W+2
        (7, 3, w0 + 8 * day),
        (8, 3, w0 + 16 * day),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        (r.cohort_period, r.age_periods): (r.n_active_users, r.retained_ppm)
        for r in retention_cohorts(ev, period_days=7).collect()
    }
    p0 = (dt.date(2024, 1, 1) - dt.date(1970, 1, 1)).days // 7
    assert got == {
        (p0, 0): (2, 1_000_000),       # u1, u2
        (p0, 1): (1, 500_000),         # u1
        (p0, 2): (1, 500_000),         # u1
        (p0 + 1, 0): (1, 1_000_000),   # u3
        (p0 + 1, 1): (1, 1_000_000),   # u3
    }


def test_retention_cohorts_validates(spark):
    import pytest as _pytest

    from split_merge_partitioner_spark.functions.events import retention_cohorts

    ev = spark.createDataFrame([], "event_id long, user_id long, ts timestamp")
    with _pytest.raises(ValueError):
        retention_cohorts(ev, period_days=0)


# ---------------------------------------------------------------------------
# event_transitions / attribution (round-5 session-3 additions)
# ---------------------------------------------------------------------------

def test_event_transitions_counts_and_ppm(spark):
    # user 1: A B A C  -> A->B, B->A, A->C ; user 2: B A -> B->A
    rows = [
        (1, _ts(0), 1, "A", 0.0),
        (2, _ts(1), 1, "B", 0.0),
        (3, _ts(2), 1, "A", 0.0),
        (4, _ts(3), 1, "C", 0.0),
        (5, _ts(0), 2, "B", 0.0),
        (6, _ts(1), 2, "A", 0.0),
    ]
    from split_merge_partitioner_spark.functions.events import event_transitions

    out = {
        (r.from_type, r.to_type): (r.n_transitions, r.prob_ppm)
        for r in event_transitions(spark.createDataFrame(rows, TS)).collect()
    }
    assert out == {
        ("A", "B"): (1, 500_000),
        ("A", "C"): (1, 500_000),
        ("B", "A"): (2, 1_000_000),
    }


def test_event_transitions_equal_ts_uses_event_id_order(spark):
    # same microsecond: event_id decides the successor order (total order)
    rows = [
        (10, _ts(0), 1, "X", 0.0),
        (11, _ts(0), 1, "Y", 0.0),
        (12, _ts(0), 1, "Z", 0.0),
    ]
    from split_merge_partitioner_spark.functions.events import event_transitions

    out = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transitions(spark.createDataFrame(rows, TS)).collect()
    }
    assert out == {("X", "Y"): 1, ("Y", "Z"): 1}


def test_attribution_last_vs_first_touch(spark):
    # user 1: view(1) click(2) purchase(3, v=2.5) -> last: click, first: view
    # user 2: purchase with no prior touch -> "(none)"
    # user 3: touch AFTER the purchase does not count
    rows = [
        (1, _ts(0), 1, "view", 0.0),
        (2, _ts(1), 1, "click", 0.0),
        (3, _ts(2), 1, "purchase", 2.5),
        (4, _ts(0), 2, "purchase", 1.0),
        (5, _ts(5), 3, "purchase", 4.0),
        (6, _ts(6), 3, "click", 0.0),
    ]
    from split_merge_partitioner_spark.functions.events import attribution

    df = spark.createDataFrame(rows, TS)
    last = {
        r.touch_type: (r.n_conversions, r.value_micros_sum)
        for r in attribution(df, "purchase", ["view", "click"], mode="last").collect()
    }
    assert last == {"click": (1, 2_500_000), "(none)": (2, 5_000_000)}
    first = {
        r.touch_type: (r.n_conversions, r.value_micros_sum)
        for r in attribution(df, "purchase", ["view", "click"], mode="first").collect()
    }
    assert first == {"view": (1, 2_500_000), "(none)": (2, 5_000_000)}


def test_attribution_equal_ts_touch_counts_if_id_sorts_first(spark):
    # touch at the SAME microsecond as the conversion: row order by
    # (ts, event_id) decides — id 1 < id 2 so the touch precedes
    rows = [
        (1, _ts(0), 1, "click", 0.0),
        (2, _ts(0), 1, "purchase", 1.0),
        (4, _ts(1), 2, "purchase", 1.0),
        (3, _ts(1), 2, "click", 0.0),  # id 3 < 4: precedes within the tie
    ]
    from split_merge_partitioner_spark.functions.events import attribution

    df = spark.createDataFrame(rows, TS)
    out = {
        r.touch_type: r.n_conversions
        for r in attribution(df, "purchase", ["click"], mode="last").collect()
    }
    assert out == {"click": 2}


def test_attribution_validation(spark):
    from split_merge_partitioner_spark.functions.events import attribution

    df = spark.createDataFrame([(1, _ts(0), 1, "purchase", 1.0)], TS)
    with pytest.raises(ValueError):
        attribution(df, "purchase", [], mode="last")
    with pytest.raises(ValueError):
        attribution(df, "purchase", ["click"], mode="middle")


def test_cochange_edges_hand_buckets(spark):
    from split_merge_partitioner_spark.sources import cochange_edges

    h = dt.datetime
    rows = [
        # users 1 & 2 share (view, hour0) and (click, hour1) -> shared=2
        (1, h(2024, 1, 1, 0, 5), 1, "view", 0.0),
        (2, h(2024, 1, 1, 0, 50), 2, "view", 0.0),
        (3, h(2024, 1, 1, 1, 10), 1, "click", 0.0),
        (4, h(2024, 1, 1, 1, 59), 2, "click", 0.0),
        # user 3 shares only ONE bucket with user 1 -> below min_shared=2
        (5, h(2024, 1, 1, 0, 30), 3, "view", 0.0),
        # same user twice in a bucket: distinct() collapses it
        (6, h(2024, 1, 1, 0, 45), 1, "view", 0.0),
        # same event type, DIFFERENT hour: no co-occurrence
        (7, h(2024, 1, 1, 2, 0), 2, "view", 0.0),
    ]
    out = {
        (r.src, r.dst): r.shared
        for r in cochange_edges(
            spark.createDataFrame(rows, TS), window_seconds=3600, min_shared=2
        ).collect()
    }
    assert out == {(1, 2): 2}


def test_cochange_edges_validation(spark):
    from split_merge_partitioner_spark.sources import cochange_edges

    df = spark.createDataFrame([(1, dt.datetime(2024, 1, 1), 1, "view", 0.0)], TS)
    with pytest.raises(ValueError):
        cochange_edges(df, window_seconds=0)


def test_decayed_user_value_hand_shifts(spark):
    from split_merge_partitioner_spark.functions.events import decayed_user_value

    h = dt.datetime
    # half-life = 1 day: event ages 0, 1, 2 days before the newest event
    rows = [
        (1, h(2024, 1, 3, 0, 0), 1, "view", 8.0),   # age 0 -> 8_000_000
        (2, h(2024, 1, 2, 0, 0), 1, "view", 8.0),   # age 1 -> 4_000_000
        (3, h(2024, 1, 1, 0, 0), 1, "view", 8.0),   # age 2 -> 2_000_000
        (4, h(2024, 1, 3, 0, 0), 2, "view", 1.0),   # age 0 -> 1_000_000
    ]
    out = {
        r.user_id: (r.n_events, r.decayed_value_micros)
        for r in decayed_user_value(
            spark.createDataFrame(rows, TS), half_life_seconds=86_400
        ).collect()
    }
    assert out == {1: (3, 14_000_000), 2: (1, 1_000_000)}


def test_decayed_user_value_age_clamp(spark):
    from split_merge_partitioner_spark.functions.events import decayed_user_value

    h = dt.datetime
    rows = [
        (1, h(2024, 1, 1), 1, "view", 1.0),
        (2, h(2025, 12, 31), 2, "view", 1.0),  # ~729 days newer
    ]
    out = {
        r.user_id: r.decayed_value_micros
        for r in decayed_user_value(
            spark.createDataFrame(rows, TS), half_life_seconds=86_400
        ).collect()
    }
    # age 729 clamps to 62: 1_000_000 >> 62 == 0, NOT an undefined shift
    assert out == {1: 0, 2: 1_000_000}
    with pytest.raises(ValueError):
        decayed_user_value(spark.createDataFrame(rows, TS), half_life_seconds=0)


def test_revenue_rollup_hand_star(spark):
    from split_merge_partitioner_spark.functions.olap import revenue_rollup

    li = spark.createDataFrame(
        [(1, 10.0, 0.1), (1, 20.0, 0.0), (2, 5.0, 0.5)],
        "l_orderkey long, l_extendedprice double, l_discount double",
    )
    od = spark.createDataFrame([(1, 7), (2, 8)], "o_orderkey long, o_custkey long")
    cu = spark.createDataFrame([(7, 100), (8, 101)], "c_custkey long, c_nationkey long")
    na = spark.createDataFrame(
        [(100, "FR", 1), (101, "DE", 1)], "n_nationkey long, n_name string, n_regionkey long"
    )
    re = spark.createDataFrame([(1, "EUROPE")], "r_regionkey long, r_name string")
    out = {
        (r.region_name, r.nation_name): (r.n_lineitems, r.revenue_micros)
        for r in revenue_rollup(li, od, cu, na, re).collect()
    }
    assert out == {
        ("EUROPE", "FR"): (2, 9_000_000 + 20_000_000),
        ("EUROPE", "DE"): (1, 2_500_000),
    }


def test_growth_accounting_hand_periods(spark):
    from split_merge_partitioner_spark.functions.events import growth_accounting

    h = dt.datetime
    day = 86_400
    # daily periods; epoch days since 1970-01-01: 2024-01-01 = 19723
    rows = [
        # day 0: users 1, 2 (both new)
        (1, h(2024, 1, 1), 1, "view", 0.0),
        (2, h(2024, 1, 1), 2, "view", 0.0),
        # day 1: user 1 retained, user 3 new; user 2 churns (counted day 1)
        (3, h(2024, 1, 2), 1, "view", 0.0),
        (4, h(2024, 1, 2), 3, "view", 0.0),
        # day 3 (gap over day 2): user 2 resurrected; 1 & 3 churn -> day 3
        (5, h(2024, 1, 4), 2, "view", 0.0),
    ]
    out = {
        r.period: (r.n_active, r.n_new, r.n_retained, r.n_resurrected, r.n_churned)
        for r in growth_accounting(
            spark.createDataFrame(rows, TS), period_seconds=day
        ).collect()
    }
    d0 = 19723
    assert out == {
        d0: (2, 2, 0, 0, 0),
        d0 + 1: (2, 1, 1, 0, 1),      # churned: user 2
        d0 + 3: (1, 0, 0, 1, 2),      # churned across the gap: users 1, 3
    }
    with pytest.raises(ValueError):
        growth_accounting(spark.createDataFrame(rows, TS), period_seconds=0)
