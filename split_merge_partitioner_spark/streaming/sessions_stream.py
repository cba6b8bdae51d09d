"""Stateful streaming sessionization via applyInPandasWithState — the
continuous counterpart of ``functions/events.py::sessionize`` (same
gap-strictly-greater semantics, same exact-integer outputs).

Each user's GroupState carries (session_id, session_start_us, last_ts_us,
n_events, value_micros_sum) — ONE constant-size state row per active user,
sharded by the state store.  Every micro-batch that touches a user emits
the user's session rows in "update" mode: closed sessions final, the open
session's running aggregate refreshed (downstream keeps the last row per
(user_id, session_id)).  An event-time timeout closes idle sessions so
state does not grow with the user universe.

Constraint (documented, standard for streaming sessionizers): events must
arrive in per-user event-time order ACROSS micro-batches (within a batch
they are sorted here).  Late cross-batch events would need a watermarked
reorder buffer in front — compose with ``withWatermark`` upstream; the
batch operator is the ground truth for replays.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StructField, StructType

SESSION_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_id", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("duration_us", LongType()),
        StructField("value_micros_sum", LongType()),
        StructField("closed", LongType()),
    ]
)
_SESSION_STATE = StructType(
    [
        StructField("session_id", LongType()),
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("n_events", LongType()),
        StructField("value_micros_sum", LongType()),
    ]
)


def _make_session_fn(gap_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        if state.hasTimedOut:
            # idle-timeout: close and emit the open session, drop the state
            sid, start, last, n, vs = (int(x) for x in state.get)
            state.remove()
            yield pd.DataFrame(
                {
                    "user_id": [user_id], "session_id": [sid], "n_events": [n],
                    "start_us": [start], "end_us": [last],
                    "duration_us": [last - start], "value_micros_sum": [vs],
                    "closed": [1],
                }
            )
            return
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts_us", "event_id"])
        if state.exists:
            sid, start, last, n, vs = (int(x) for x in state.get)
        else:
            sid, start, last, n, vs = 0, None, None, 0, 0
        out: list[list[int]] = []
        for ts_us, vm in zip(batch["ts_us"].astype("int64"),
                             batch["value_micros"].astype("int64")):
            ts_us, vm = int(ts_us), int(vm)
            if start is None:
                sid, start, last, n, vs = sid + 1, ts_us, ts_us, 1, vm
            elif ts_us - last > gap_us:
                out.append([user_id, sid, n, start, last, last - start, vs, 1])
                sid, start, last, n, vs = sid + 1, ts_us, ts_us, 1, vm
            else:
                last, n, vs = ts_us, n + 1, vs + vm
        out.append([user_id, sid, n, start, last, last - start, vs, 0])
        state.update((sid, start, last, n, vs))
        # event-time timeout one gap past the newest event: fires once the
        # watermark passes it, closing the open session exactly at gap age.
        # Clamped one ms above the current watermark — Spark rejects timeout
        # timestamps at or below it (late-arriving keys would throw).
        state.setTimeoutTimestamp(
            max(last // 1000 + gap_us // 1000, state.getCurrentWatermarkMs() + 1)
        )
        yield pd.DataFrame(
            out,
            columns=[
                "user_id", "session_id", "n_events", "start_us", "end_us",
                "duration_us", "value_micros_sum", "closed",
            ],
        )

    return fn


def streaming_sessionize(
    events_stream: DataFrame,
    gap_seconds: int = 14_400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Continuous gap-based sessionization of an event stream.  Emits, per
    micro-batch and touched user, the closed sessions (closed=1, final) and
    the open session's running aggregate (closed=0); session numbering and
    all integer outputs match the batch ``sessionize`` given in-order
    arrival.  Requires a watermark on ``ts_col`` for the idle timeout.

    Identity note: the idle timeout REMOVES the user's state (state stays
    O(active users), not O(ever-seen users)), so session_id restarts at 1
    after an idle period — (user_id, session_id, start_us) is the unique
    session identity across the stream's lifetime, not (user_id,
    session_id)."""
    # Spark watermarks demand TIMESTAMP (not NTZ) event time, so streams
    # arrive with a TIMESTAMP ts; NTZ is still accepted for symmetry with
    # the batch op (but cannot carry a watermark, i.e. no idle timeout)
    from pyspark.sql.types import TimestampNTZType

    if isinstance(events_stream.schema[ts_col].dataType, TimestampNTZType):
        us = F.expr(
            f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {ts_col})"
        ).cast("long")
    else:
        us = F.unix_micros(F.col(ts_col))
    # ts_col is kept in the projection: the event-time/watermark column must
    # survive into the stateful operator for EventTimeTimeout to resolve
    keyed = events_stream.select(
        F.col(ts_col),
        F.col(user_col).cast("long").alias("user_id"),
        us.alias("ts_us"),
        F.col(id_col).cast("long").alias("event_id"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("value_micros"),
    )
    return keyed.groupBy("user_id").applyInPandasWithState(
        _make_session_fn(int(gap_seconds) * 1_000_000),
        outputStructType=SESSION_OUT,
        stateStructType=_SESSION_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
