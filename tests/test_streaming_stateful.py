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
