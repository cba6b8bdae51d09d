"""Stateful streaming CUSUM rate-shift monitor — the continuous twin of
``functions/events.py::cusum_changepoints`` (same bucket semantics, same
max-reset recurrence, explicit k/h because a stream has no "whole
dataset" to derive the expected rate from).

Per event type the GroupState is three integers: the OPEN bucket id, its
running count, and the CUSUM value folded over every CLOSED bucket.  A
bucket closes when a later bucket's first event arrives; gap buckets in
between fold as zero counts (silence is evidence — exactly the batch
operator's densification), each emitting its own row.  Output rows are
per closed bucket (event_type, bucket, n_events, cusum, is_alarm) —
identical to the batch operator over the same prefix with the same
(k, h), minus the still-open final bucket (equivalence pinned in tests
across micro-batch splits).

Arrival contract: per-type event-time order across micro-batches (the
streaming_sessionize contract); rows for already-closed buckets are
DROPPED (counted nowhere) — bound lateness upstream with a watermark.
State is 3 longs per event type, no timeout: a type's monitor lives as
long as the query.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

CUSUM_OUT = StructType(
    [
        StructField("event_type", StringType()),
        StructField("bucket", LongType()),
        StructField("n_events", LongType()),
        StructField("cusum", LongType()),
        StructField("is_alarm", BooleanType()),
    ]
)
_CUSUM_STATE = StructType(
    [
        StructField("cur_bucket", LongType()),
        StructField("cur_count", LongType()),
        StructField("cusum", LongType()),
    ]
)


def _make_cusum_fn(k: int, h: int, bucket_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        et = str(key[0])
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        buckets = (batch["ts_us"].astype("int64") // bucket_us).sort_values()
        counts = buckets.value_counts().sort_index()
        if state.exists:
            cur_bucket, cur_count, cusum = (int(v) for v in state.get)
        else:
            cur_bucket, cur_count, cusum = int(counts.index[0]), 0, 0
        out: list[list] = []
        for b, c in counts.items():
            b, c = int(b), int(c)
            if b < cur_bucket:
                continue  # late row for a closed bucket: dropped (contract)
            while cur_bucket < b:  # close current + any gap buckets
                cusum = max(0, cusum + cur_count - k)
                out.append([et, cur_bucket, cur_count, cusum, cusum > h])
                cur_bucket += 1
                cur_count = 0
            cur_count += c
        state.update((cur_bucket, cur_count, cusum))
        if out:
            yield pd.DataFrame(
                out, columns=["event_type", "bucket", "n_events", "cusum", "is_alarm"]
            )

    return fn


def streaming_cusum(
    events_stream: DataFrame,
    k: int,
    h: int,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """One output row per CLOSED time bucket per event type, carrying the
    folded CUSUM value and the alarm flag (cusum > h)."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(events_stream.schema[ts_col].dataType, TimestampNTZType):
        us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).cast("long")
    else:
        us = F.unix_micros(F.col(ts_col))
    prepared = events_stream.select(
        F.col(type_col).alias("event_type"), us.alias("ts_us")
    )
    return prepared.groupBy("event_type").applyInPandasWithState(
        _make_cusum_fn(k, h, bucket_us),
        outputStructType=CUSUM_OUT,
        stateStructType=_CUSUM_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
