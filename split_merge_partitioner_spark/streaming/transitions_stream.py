"""Stateful streaming event-transition extraction — the continuous
counterpart of ``functions/events.py::event_transitions`` (same total
(ts, event_id) per-user order, same successor semantics).

Each user's GroupState carries exactly the LAST event seen: (ts_us,
event_id, event_type) — one constant-size row per ever-active user (the
minimal "last seen" store; there is no idle timeout because dropping the
state would silently drop the user's next transition — if the user
universe must be bounded, bound it upstream).  Every micro-batch emits one
row PER TRANSITION (user_id, from_type, to_type, ts_us); counting them
grouped by (from, to) over the stream's lifetime reproduces the batch
operator's n_transitions exactly, given per-user event-time order across
micro-batches (within a batch they are sorted here — the
streaming_sessionize arrival contract).

Emitting increments instead of running counts keeps the operator
composable: a downstream watermarked groupBy gives windowed transition
matrices, a plain foreachBatch upsert gives lifetime totals — neither
bakes an aggregation policy into the extractor.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

TRANSITION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("from_type", StringType()),
        StructField("to_type", StringType()),
        StructField("ts_us", LongType()),
    ]
)
_LAST_STATE = StructType(
    [
        StructField("last_us", LongType()),
        StructField("last_eid", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _transitions_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    user_id = int(key[0])
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch) == 0:
        return
    batch = batch.sort_values(["ts_us", "event_id"])
    if state.exists:
        last_us, last_eid, last_type = state.get
        last_us, last_eid = int(last_us), int(last_eid)
    else:
        last_us, last_eid, last_type = None, None, None
    out: list[list] = []
    for ts_us, eid, et in zip(
        batch["ts_us"].astype("int64"),
        batch["event_id"].astype("int64"),
        batch["event_type"],
    ):
        ts_us, eid, et = int(ts_us), int(eid), str(et)
        if last_type is not None:
            out.append([user_id, last_type, et, ts_us])
        last_us, last_eid, last_type = ts_us, eid, et
    state.update((last_us, last_eid, last_type))
    if out:
        yield pd.DataFrame(out, columns=["user_id", "from_type", "to_type", "ts_us"])


def streaming_transitions(
    events_stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """One output row per observed transition (user_id, from_type, to_type,
    ts_us of the successor event); state = the user's last event only."""
    from pyspark.sql.types import TimestampNTZType

    if isinstance(events_stream.schema[ts_col].dataType, TimestampNTZType):
        us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).cast("long")
    else:
        us = F.unix_micros(F.col(ts_col))
    prepared = events_stream.select(
        F.col(user_col).alias("user_id"),
        us.alias("ts_us"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("event_type"),
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _transitions_fn,
        outputStructType=TRANSITION_OUT,
        stateStructType=_LAST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
