"""Structured Streaming edge ingest.

The reference is batch-only (SURVEY.md §2.5: no streaming); this module is the
engine's Spark-native extension for continuously arriving edges (e.g. new
commits creating new co-change links): a streaming source feeds the same
canonicalization as the batch path, plus watermarked per-window degree counts
(the streaming analog of the reference's .degree file).

Designed for any streaming source (Kafka/files); tests use the file source
over parquet drops, which is what a 100 TB ingest looks like from Spark's
side anyway (object-store file listings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType, TimestampType

EDGE_STREAM_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("event_time", TimestampType()),
    ]
)


def streaming_edge_ingest(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream of (src, dst, event_time) rows, canonicalized like
    the batch path (src<dst, self-loops dropped; conversions.cpp:54-56
    semantics).  Dedup is windowed downstream — a global distinct is
    unbounded state."""
    raw = spark.readStream.schema(EDGE_STREAM_SCHEMA).parquet(path)
    lo = F.least("src", "dst").cast("long").alias("src")
    hi = F.greatest("src", "dst").cast("long").alias("dst")
    return raw.select(lo, hi, "event_time").where(F.col("src") != F.col("dst"))


def streaming_degree_counts(
    edges_stream: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-event-time-window undirected degree counts with late-data handling:
    the streaming analog of the degree table (conversions.hpp:56-57)."""
    ends = edges_stream.withWatermark("event_time", watermark)
    verts = ends.select(
        F.col("src").alias("vertex"), "event_time"
    ).unionAll(ends.select(F.col("dst").alias("vertex"), "event_time"))
    return (
        verts.groupBy(F.window("event_time", window).alias("w"), "vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
        .select(
            F.col("w.start").alias("window_start"),
            "vertex",
            "degree",
        )
    )


def streaming_dbh_router(
    edges_stream: DataFrame, degree_snapshot: DataFrame, p: int
) -> DataFrame:
    """Route continuously arriving edges to DBH buckets using a broadcast
    degree SNAPSHOT — the production pattern for a live ingest: new edges are
    placed by the last batch-computed degree table (expr_partitioners.py
    rule, degree.hpp:24-27 semantics), while full repartitioning remains a
    periodic batch job.  Stateless (broadcast join + expression), so it runs
    in any output mode with no streaming state store.

    Vertices unseen by the snapshot get degree 0: a brand-new vertex is by
    definition the low-degree endpoint, so the cut lands on it — exactly the
    DBH intent for hubs-vs-newcomers."""
    d = F.broadcast(degree_snapshot)
    e = (
        edges_stream.join(
            d.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"),
            "src", "left",
        )
        .join(
            d.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"),
            "dst", "left",
        )
        .withColumn("deg_src", F.coalesce("deg_src", F.lit(0)))
        .withColumn("deg_dst", F.coalesce("deg_dst", F.lit(0)))
    )
    bucket = F.pmod(
        F.when(F.col("deg_src") <= F.col("deg_dst"), F.col("src")).otherwise(F.col("dst")),
        F.lit(p),
    ).cast("long")
    return e.select("src", "dst", "event_time", bucket.alias("bucket"))
