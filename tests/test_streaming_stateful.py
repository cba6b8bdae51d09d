"""applyInPandasWithState custom stateful streaming operators: state must
carry ACROSS micro-batches (first-occurrence dedup, running degrees)."""

from __future__ import annotations

import pandas as pd


def _run_batches(spark, tmp_path, make_stream, batches, query_name):
    """Drop parquet files one at a time, restarting an availableNow query
    against the SAME checkpoint after each drop, so state recovery across
    restarts is exercised too; returns the collected rows per drop."""
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    outs = []
    for i, pdf in enumerate(batches):
        spark.createDataFrame(pdf).write.mode("append").parquet(src_dir)
        stream = make_stream(src_dir)
        collected = []

        def sink(batch_df, _bid, _c=collected):
            _c.append(batch_df.toPandas())

        q = (
            stream.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        outs.append(
            pd.concat(collected)
            if collected
            else pd.DataFrame(columns=stream.schema.names)
        )
    return outs


def test_streaming_exact_dedup_state_across_batches(spark, tmp_path):
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from split_merge_partitioner_spark.streaming import streaming_exact_dedup

    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )

    def make(src_dir):
        docs = spark.readStream.schema(schema).parquet(src_dir)
        return streaming_exact_dedup(docs)

    b1 = pd.DataFrame({"doc_id": [5, 9, 7], "text": ["aaa", "aaa", "bbb"]})
    b2 = pd.DataFrame({"doc_id": [1, 2], "text": ["aaa", "ccc"]})
    out1, out2 = _run_batches(spark, tmp_path, make, [b1, b2], "dedup_state")

    r1 = out1.set_index("text_md5")
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert r1.loc[md5("aaa")].keeper_id == 5
    assert r1.loc[md5("aaa")].total_copies == 2
    assert r1.loc[md5("aaa")].is_first_batch == 1
    assert r1.loc[md5("bbb")].keeper_id == 7

    r2 = out2.set_index("text_md5")
    # state carried: "aaa" keeps keeper 5 (NOT 1), totals 3, not first any more
    assert r2.loc[md5("aaa")].keeper_id == 5
    assert r2.loc[md5("aaa")].total_copies == 3
    assert r2.loc[md5("aaa")].is_first_batch == 0
    assert r2.loc[md5("ccc")].is_first_batch == 1


def test_streaming_running_degrees(spark, tmp_path):
    import datetime as dt

    from split_merge_partitioner_spark.streaming import (
        streaming_edge_ingest,
        streaming_vertex_degrees_stateful,
    )

    t0 = dt.datetime(2026, 1, 1)
    b1 = pd.DataFrame({"src": [1, 2], "dst": [2, 3], "event_time": [t0, t0]})
    b2 = pd.DataFrame({"src": [1], "dst": [3], "event_time": [t0]})

    def make(src_dir):
        return streaming_vertex_degrees_stateful(
            streaming_edge_ingest(spark, src_dir)
        )

    out1, out2 = _run_batches(spark, tmp_path, make, [b1, b2], "deg_state")
    d1 = dict(zip(out1.vertex, out1.degree))
    assert d1 == {1: 1, 2: 2, 3: 1}
    d2 = dict(zip(out2.vertex, out2.degree))
    # running totals: only touched vertices re-emit, with cumulative counts
    assert d2 == {1: 2, 3: 2}


def test_streaming_sessionize_state_and_timeout(spark, tmp_path):
    """Session state carries across micro-batches (and query restarts via the
    shared checkpoint); the event-time timeout closes idle users' sessions
    once the watermark passes last_event + gap."""
    import datetime as dt

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
        TimestampType,
    )

    from split_merge_partitioner_spark.streaming import streaming_sessionize

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def make(src_dir):
        ev = spark.readStream.schema(schema).parquet(src_dir)
        return streaming_sessionize(
            ev.withWatermark("ts", "0 seconds"), gap_seconds=60
        )

    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731
    b1 = pd.DataFrame(
        {"event_id": [1, 2, 3], "ts": [sec(0), sec(30), sec(0)],
         "user_id": [1, 1, 2], "value": [1.0, 2.0, 9.0]}
    )
    # user 1 returns 200 s later (> gap 60): closes session 1, opens 2;
    # user 2 is idle -> the advanced watermark fires their timeout
    b2 = pd.DataFrame(
        {"event_id": [4], "ts": [sec(200)], "user_id": [1], "value": [4.0]}
    )
    # a third batch only advances the watermark past user 1's open session
    b3 = pd.DataFrame(
        {"event_id": [5], "ts": [sec(600)], "user_id": [3], "value": [0.0]}
    )
    out1, out2, out3 = _run_batches(
        spark, tmp_path, make, [b1, b2, b3], "sessionize_state"
    )

    r1 = out1.set_index(["user_id", "session_id"]).sort_index()
    assert r1.loc[(1, 1)].n_events == 2 and r1.loc[(1, 1)].closed == 0
    assert r1.loc[(1, 1)].duration_us == 30_000_000
    assert r1.loc[(1, 1)].value_micros_sum == 3_000_000
    assert r1.loc[(2, 1)].n_events == 1

    r2 = out2.set_index(["user_id", "session_id", "closed"]).sort_index()
    # state carried: session 1 closes with BOTH batch-1 events; session 2 opens
    assert r2.loc[(1, 1, 1)].n_events == 2
    assert r2.loc[(1, 2, 0)].n_events == 1
    # session 2 starts 200 s after session 1 (relative: TZ-independent)
    assert r2.loc[(1, 2, 0)].start_us - r1.loc[(1, 1)].start_us == 200_000_000
    # user 2's idle timeout fired in batch 2 or 3 (watermark timing): closed=1
    u2_closed = pd.concat([out2, out3])
    u2_closed = u2_closed[(u2_closed.user_id == 2) & (u2_closed.closed == 1)]
    assert len(u2_closed) == 1 and u2_closed.iloc[0].n_events == 1

    # user 1's open session 2 eventually times out too
    u1s2 = out3[(out3.user_id == 1) & (out3.session_id == 2)]
    assert len(u1s2) == 1 and u1s2.iloc[0].closed == 1


def test_streaming_recent_meta_join_window_and_cross_batch(spark, tmp_path):
    """Stream-stream interval join: events enrich with metadata rows in
    (e.ts - 1h, e.ts]; pairs outside the window never appear, and a
    metadata row from batch 1 joins an event arriving in batch 2."""
    import datetime as dt

    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType, TimestampNTZType,
    )

    from split_merge_partitioner_spark.streaming import streaming_recent_meta_join

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ts(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    ev_schema = StructType([
        StructField("user_id", LongType()), StructField("ts", TimestampNTZType()),
        StructField("event_id", LongType()),
    ])
    mt_schema = StructType([
        StructField("user_id", LongType()), StructField("ts", TimestampNTZType()),
        StructField("segment", StringType()),
    ])
    src_e = str(tmp_path / "ev")
    src_m = str(tmp_path / "mt")
    ckpt = str(tmp_path / "ckpt")

    def run():
        ev = spark.readStream.schema(ev_schema).parquet(src_e)
        mt = spark.readStream.schema(mt_schema).parquet(src_m)
        out = streaming_recent_meta_join(ev, mt, window_seconds=3600)
        rows = []

        def sink(bdf, _bid):
            rows.extend(
                (r["event_id"], r["m_segment"]) for r in bdf.collect()
            )

        q = (
            out.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        return rows

    # batch 1: meta at t+0 (u1: "gold"), t-90min (u1: "stale"); event u1@t+30
    spark.createDataFrame(
        [(1, ts(0), "gold"), (1, ts(-90), "stale"), (2, ts(0), "blue")], mt_schema
    ).write.mode("append").parquet(src_m)
    spark.createDataFrame([(1, ts(30), 100)], ev_schema).write.mode("append").parquet(src_e)
    got1 = run()
    # u1@t+30 joins "gold" (30min lag) but NOT "stale" (120min) nor u2's row
    assert sorted(got1) == [(100, "gold")]

    # batch 2: a NEW event joins metadata buffered from batch 1
    spark.createDataFrame([(2, ts(40), 200)], ev_schema).write.mode("append").parquet(src_e)
    spark.createDataFrame([(3, ts(40), "x")], mt_schema).write.mode("append").parquet(src_m)
    got2 = run()
    assert (200, "blue") in got2
    assert all(eid != 100 for eid, _ in got2)  # no re-emission in append mode


def test_streaming_transitions_state_across_batches_matches_batch_twin(spark, tmp_path):
    """The last-event state carries across micro-batches (and a query
    restart via the shared checkpoint); lifetime (from,to) counts equal the
    batch event_transitions on the concatenated log."""
    import datetime as dt

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from split_merge_partitioner_spark.streaming import streaming_transitions

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    sec = lambda s: t0 + dt.timedelta(seconds=s)  # noqa: E731

    def make(src_dir):
        ev = spark.readStream.schema(schema).parquet(src_dir)
        return streaming_transitions(ev)

    b1 = pd.DataFrame(
        {"event_id": [1, 2, 3], "ts": [sec(0), sec(10), sec(5)],
         "user_id": [1, 1, 2], "event_type": ["A", "B", "X"]}
    )
    # cross-batch transition: user 1's B (batch 1) -> A (batch 2);
    # user 2's X -> X self-transition
    b2 = pd.DataFrame(
        {"event_id": [4, 5], "ts": [sec(20), sec(25)],
         "user_id": [1, 2], "event_type": ["A", "X"]}
    )
    out1, out2 = _run_batches(spark, tmp_path, make, [b1, b2], "transitions_state")

    got1 = set(map(tuple, out1[["user_id", "from_type", "to_type"]].values))
    assert got1 == {(1, "A", "B")}
    got2 = set(map(tuple, out2[["user_id", "from_type", "to_type"]].values))
    assert got2 == {(1, "B", "A"), (2, "X", "X")}

    # lifetime counts == the batch twin over the whole log
    from split_merge_partitioner_spark.functions.events import event_transitions

    full = pd.concat([b1, b2], ignore_index=True)
    full["value"] = 0.0
    batch_counts = {
        (r.from_type, r.to_type): r.n_transitions
        for r in event_transitions(spark.createDataFrame(full)).collect()
    }
    stream_counts: dict = {}
    for df in (out1, out2):
        for _, r in df.iterrows():
            k = (r.from_type, r.to_type)
            stream_counts[k] = stream_counts.get(k, 0) + 1
    assert stream_counts == batch_counts


def test_streaming_cusum_matches_batch_twin_across_batches(spark, tmp_path):
    """CUSUM state (open bucket + folded value) carries across micro-batches
    and restarts; the closed-bucket rows equal the batch twin with the same
    (k, h) on the concatenated log, minus the still-open final bucket."""
    import datetime as dt

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from split_merge_partitioner_spark.functions.events import cusum_changepoints
    from split_merge_partitioner_spark.streaming import streaming_cusum

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)
    hour = lambda b, j: t0 + dt.timedelta(hours=b, minutes=j % 50)  # noqa: E731

    # type "a": 2/bucket for buckets 0..3, then a gap (4), then 7/bucket 5..6
    def rows(buckets):
        out, eid = [], 0
        for b, n in buckets:
            for j in range(n):
                out.append((eid, hour(b, j), 1, "a"))
                eid += 1
        return pd.DataFrame(out, columns=["event_id", "ts", "user_id", "event_type"])

    b1 = rows([(0, 2), (1, 2), (2, 2)])
    b2 = rows([(3, 2), (5, 7), (6, 7), (7, 1)])  # bucket 4 is silent

    def make(src_dir):
        ev = spark.readStream.schema(schema).parquet(src_dir)
        return streaming_cusum(ev, k=2, h=4)

    out1, out2 = _run_batches(spark, tmp_path, make, [b1, b2], "cusum_state")
    got = pd.concat([out1, out2]).sort_values("bucket")

    # batch twin on the full log with same k/h; drop the open bucket (7)
    full = spark.createDataFrame(pd.concat([b1, b2]))
    exp = (
        cusum_changepoints(full, k=2, h=4)
        .toPandas()
        .sort_values("bucket")
    )
    exp = exp[exp["bucket"] < exp["bucket"].max()]
    got_rel = got.copy()
    got_rel["bucket"] = got_rel["bucket"] - got_rel["bucket"].min()
    assert list(got_rel["n_events"]) == list(exp["n_events"])
    assert list(got_rel["cusum"]) == list(exp["cusum"])
    assert list(got_rel["is_alarm"]) == list(exp["is_alarm"])
    # the gap bucket (silence) emitted its own row
    assert (got_rel["n_events"] == 0).sum() == 1
    # alarm fires only after the rate shift
    alarmed = got_rel[got_rel["is_alarm"]]
    assert len(alarmed) > 0 and alarmed["bucket"].min() >= 5


def test_streaming_gap_regularity_matches_batch_twin(spark, tmp_path):
    """Per-user gap moments carry across micro-batches and restarts; the
    LATEST emitted row per user equals the batch twin on the whole log —
    including the >int64 square-sum path (month-long microsecond gaps)."""
    import datetime as dt

    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    from split_merge_partitioner_spark.functions.events import gap_regularity
    from split_merge_partitioner_spark.streaming import streaming_gap_regularity

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
        ]
    )
    t0 = dt.datetime(2024, 1, 1)

    def rows(specs):
        # specs: (event_id, user, offset_seconds)
        return pd.DataFrame(
            [(i, t0 + dt.timedelta(seconds=s), u, "x") for i, u, s in specs],
            columns=["event_id", "ts", "user_id", "event_type"],
        )

    # user 1: bot (fixed 60 s); user 2: human-ish varied gaps incl. a
    # 20-day gap (square sum far past int64); user 3: stays under min_gaps
    b1 = rows([(1, 1, 0), (2, 1, 60), (3, 1, 120),
               (10, 2, 0), (11, 2, 50), (12, 2, 1_728_000),
               (20, 3, 0)])
    b2 = rows([(4, 1, 180), (5, 1, 240),
               (13, 2, 1_728_100), (14, 2, 3_456_000),
               (21, 3, 7)])

    def make(src_dir):
        ev = spark.readStream.schema(schema).parquet(src_dir)
        return streaming_gap_regularity(ev)

    out1, out2 = _run_batches(spark, tmp_path, make, [b1, b2], "reg_state")
    latest = {}
    for df in (out1, out2):
        for _, r in df.iterrows():
            latest[int(r.user_id)] = tuple(
                int(r[c]) for c in
                ("n_gaps", "mean_gap_us", "min_gap_us", "max_gap_us", "cv2_ppm")
            ) + (bool(r.is_regular),)

    full = spark.createDataFrame(pd.concat([b1, b2]))
    exp = {
        int(r["user_id"]): (
            int(r["n_gaps"]), int(r["mean_gap_us"]), int(r["min_gap_us"]),
            int(r["max_gap_us"]), int(r["cv2_ppm"]), bool(r["is_regular"]),
        )
        for r in gap_regularity(full).collect()
    }
    assert latest == exp
    assert 3 not in latest  # under min_gaps never emits


def test_streaming_triangle_maintenance(spark, tmp_path):
    """Per-batch lineage totals must match full recounts of the prefix
    union, and a replayed batch_id must be a no-op (idempotent sink)."""
    from pyspark.sql.types import LongType, StructField, StructType

    from split_merge_partitioner_spark.graph import triangle_count
    from split_merge_partitioner_spark.streaming import (
        streaming_triangle_maintenance,
        triangle_maintenance_sink,
    )

    schema = StructType(
        [StructField("src", LongType()), StructField("dst", LongType())]
    )
    src_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    state = str(tmp_path / "state")
    batches = [
        pd.DataFrame({"src": [0, 1, 0], "dst": [1, 2, 2]}),   # one triangle
        pd.DataFrame({"src": [2, 3, 0], "dst": [3, 0, 2]}),   # +1 tri (0,2,3); dup (0,2)
        pd.DataFrame({"src": [1, 1], "dst": [3, 0]}),         # +2 tris via (1,3)
    ]
    for pdf in batches:
        spark.createDataFrame(pdf).write.mode("append").parquet(src_dir)
        stream = spark.readStream.schema(schema).parquet(src_dir)
        q = (
            streaming_triangle_maintenance(stream, state)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    totals = (
        spark.read.parquet(str(tmp_path / "state" / "totals"))
        .orderBy("batch_id")
        .collect()
    )
    assert len(totals) == 3
    # running totals must equal full recounts of each prefix
    prefix = []
    for i, row in enumerate(totals):
        prefix += list(batches[i].itertuples(index=False, name=None))
        canon = sorted({(min(a, b), max(a, b)) for a, b in prefix if a != b})
        full = triangle_count(
            spark.createDataFrame(canon, "src long, dst long"), orient="id"
        )
        assert row.total_triangles == full, (i, row, full)
    assert [r.delta_triangles for r in totals] == [1, 1, 2]

    # idempotence: replaying an already-applied batch_id changes nothing
    sink = triangle_maintenance_sink(spark, state)
    sink(spark.createDataFrame(batches[0]), totals[0].batch_id)
    replay = spark.read.parquet(str(tmp_path / "state" / "totals")).collect()
    assert len(replay) == 3
