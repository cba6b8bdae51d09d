"""Stateful streaming inter-event regularity (bot-signal) monitor — the
continuous twin of ``functions/events.py::gap_regularity``: same
microsecond-gap moments, same exact-integer CV^2-ppm formula.

Per user the GroupState is six integers: last event timestamp, gap count,
gap sum, min, max, and the gap SQUARE sum — which exceeds int64 (a month of
microseconds squared), so it is carried as two longs (hi, lo) in base 2^62
and recombined into an unbounded Python int inside the kernel; the CV^2
arithmetic is then exact integer math, bit-identical to the batch
operator's DECIMAL(38,0) path (floor of non-negative ratios).

After each micro-batch the monitor emits the CURRENT profile row for every
user the batch touched (outputMode=update semantics): the latest row per
user equals the batch twin over the concatenated log (equivalence pinned
in tests across micro-batch splits and restarts).  Users under ``min_gaps``
emit nothing yet.

Arrival contract: per-user event-time order ACROSS micro-batches (the
streaming_sessionize contract); within a batch rows are sorted by
(ts, event_id) before folding.  State is 7 longs per user, no timeout.
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
    StructField,
    StructType,
)

_B62 = 1 << 62

REGULARITY_OUT = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_gaps", LongType()),
        StructField("mean_gap_us", LongType()),
        StructField("min_gap_us", LongType()),
        StructField("max_gap_us", LongType()),
        StructField("cv2_ppm", LongType()),
        StructField("is_regular", BooleanType()),
    ]
)
_REG_STATE = StructType(
    [
        StructField("last_us", LongType()),
        StructField("n_gaps", LongType()),
        StructField("sum_gap", LongType()),
        StructField("min_gap", LongType()),
        StructField("max_gap", LongType()),
        StructField("ssq_hi", LongType()),
        StructField("ssq_lo", LongType()),
    ]
)


def _make_regularity_fn(min_gaps: int, cv2_ppm_threshold: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        uid = int(key[0])
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["ts_us", "event_id"])
        ts = [int(v) for v in batch["ts_us"]]
        if state.exists:
            last, n, sx, mn, mx, hi, lo = (int(v) for v in state.get)
            ssq = hi * _B62 + lo
        else:
            last, n, sx, mn, mx, ssq = ts[0], 0, 0, None, None, 0
            ts = ts[1:]
            mn = mx = None
        for t in ts:
            g = t - last
            last = t
            n += 1
            sx += g
            ssq += g * g
            mn = g if mn is None else min(mn, g)
            mx = g if mx is None else max(mx, g)
        state.update(
            (last, n, sx, mn if mn is not None else 0, mx if mx is not None else 0,
             ssq // _B62, ssq % _B62)
        )
        if n < min_gaps:
            return
        varnum = n * ssq - sx * sx
        cv2 = (1_000_000 * varnum) // (sx * sx) if sx > 0 else 0
        yield pd.DataFrame(
            [[uid, n, sx // n, mn, mx, cv2, cv2 < cv2_ppm_threshold]],
            columns=[f.name for f in REGULARITY_OUT.fields],
        )

    return fn


def streaming_gap_regularity(
    events_stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 4,
    cv2_ppm_threshold: int = 250_000,
) -> DataFrame:
    """One output row per touched user per micro-batch with the CURRENT
    regularity profile; the latest row per user equals the batch twin."""
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
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        _make_regularity_fn(min_gaps, cv2_ppm_threshold),
        outputStructType=REGULARITY_OUT,
        stateStructType=_REG_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
