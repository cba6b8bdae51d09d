"""Watermarked stream-stream interval join: enrich a live event stream
with the most recent slice of a second live stream (metadata updates,
model-version rollouts, experiment assignments) — the canonical
Structured Streaming join shape for "what did we know about this user
when the event happened".

Semantics: inner-join event e to every metadata row m of the same key
with m.ts in (e.ts - window_seconds, e.ts] — the bounded-staleness
containment window.  Both sides carry event-time watermarks, which is
what LETS Spark bound the join state: each side's buffered rows are
dropped once the other side's watermark passes the join window, so state
is O(rate x (window + watermark)) per key group, never unbounded (an
un-watermarked stream-stream join accumulates forever — the documented
failure mode this module exists to avoid).

The batch twin of this operator is functions/events.py::range_join
(bucketed containment); this is the readStream/writeStream counterpart.
At 10^12 events/day the state bound — not throughput — is the design
constraint: size the watermark to the real out-of-orderness (the delay
distribution's tail), not to worst-case paranoia.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_recent_meta_join(
    events: DataFrame,
    meta: DataFrame,
    key_col: str = "user_id",
    window_seconds: int = 3600,
    watermark: str = "2 hours",
) -> DataFrame:
    """events (key, ts, ...) ⋈ meta (key, ts, ...) where the meta row's ts
    lies in (event.ts - window_seconds, event.ts].  Meta columns come back
    prefixed ``m_`` (key and ts included, so the lag is inspectable).
    Both inputs must be streaming DataFrames with event-time ``ts``;
    TIMESTAMP_NTZ columns (the parquet default) are cast to TIMESTAMP in
    the session zone — Spark's watermark machinery only accepts TIMESTAMP,
    and the join condition is interval-relative so the zone choice cannot
    change which rows pair."""
    e = events.withColumn("ts", F.col("ts").cast("timestamp")).withWatermark(
        "ts", watermark
    )
    m = (
        meta.withColumn("ts", F.col("ts").cast("timestamp"))
        .select([F.col(c).alias(f"m_{c}") for c in meta.columns])
        .withWatermark("m_ts", watermark)
    )
    cond = (
        (F.col(key_col) == F.col(f"m_{key_col}"))
        & (F.col("m_ts") <= F.col("ts"))
        & (F.col("m_ts") > F.col("ts") - F.expr(f"interval {int(window_seconds)} seconds"))
    )
    return e.join(m, cond, "inner")
