"""HDRF (High-Degree Replicated First) streaming partitioner.

Reference parity (/root/reference/src/hdrf_partitioner.cpp):
- score(u,v,b) = g_u + g_v + lambda * (max_size - |b|)/(1 + max_size - min_size)
  where g_x = 1 + (1 - deg_x/(deg_u+deg_v)) if x already replicated in b else 0
  (compute_partition_score :150-174; best_scored_partition :136-148)
- lambda default 1.1 (src/main.cpp:32, hdrf_partitioner.hpp:22)

HDRF is inherently sequential (global replica-set + size state).  The standard
distributed practice — and ours — is PARTITION-LOCAL state: each Spark task
streams its edge batch through an independent HDRF state machine writing into
the same global bucket space [0, p).  Documented deviation: replica sets are
per-task, so RF is slightly higher than single-threaded HDRF; balance is
preserved because every task balances its own stream.  Runs as mapInPandas
(Arrow batches, NumPy state), no per-row Python in the plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

DEFAULT_LAMBDA = 1.1

_SCHEMA = StructType(
    [
        StructField("src", LongType()),
        StructField("dst", LongType()),
        StructField("bucket", LongType()),
    ]
)


def _hdrf_task(p: int, lam: float):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sizes = np.zeros(p, dtype=np.int64)
        replicas: list[set[int]] = [set() for _ in range(p)]
        for pdf in batches:
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            du = pdf["deg_src"].to_numpy(np.float64)
            dv = pdf["deg_dst"].to_numpy(np.float64)
            out = np.empty(len(src), dtype=np.int64)
            for i in range(len(src)):
                u, v = int(src[i]), int(dst[i])
                degsum = du[i] + dv[i]
                gu_in = 1.0 + (1.0 - du[i] / degsum)
                gv_in = 1.0 + (1.0 - dv[i] / degsum)
                mx, mn = sizes.max(), sizes.min()
                denom = 1.0 + mx - mn
                best_b, best_s = 0, -1.0
                for b in range(p):
                    s = lam * (mx - sizes[b]) / denom
                    if u in replicas[b]:
                        s += gu_in
                    if v in replicas[b]:
                        s += gv_in
                    if s > best_s:
                        best_s, best_b = s, b
                out[i] = best_b
                sizes[best_b] += 1
                replicas[best_b].add(u)
                replicas[best_b].add(v)
            yield pd.DataFrame({"src": src, "dst": dst, "bucket": out})

    return run


def hdrf_partition(
    edges: DataFrame,
    p: int,
    deg: DataFrame | None = None,
    lam: float = DEFAULT_LAMBDA,
    num_streams: int | None = None,
) -> DataFrame:
    """Partition-local HDRF.  edges: (src, dst); returns (src, dst, bucket)."""
    from ..sources.edges import degrees as degrees_of

    if deg is None:
        deg = degrees_of(edges)
    degb = F.broadcast(deg)
    e = (
        edges.join(degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
        .select("src", "dst", "deg_src", "deg_dst")
    )
    if num_streams:
        e = e.repartition(num_streams, F.pmod(F.xxhash64("src", "dst"), F.lit(num_streams)))
    return e.mapInPandas(_hdrf_task(p, lam), schema=_SCHEMA)
