"""EBV (Efficient and Balanced Vertex-cut) streaming partitioner.

Reference parity (/root/reference/src/ebv_partitioner.cpp):
- edges sorted by deg(u)+deg(v) ascending before streaming (:69-73)
- per edge: argmin_b (s_u + s_v) + |b|_e/avg_e + |b|_v/avg_v where s_x = 1
  iff x NOT yet replicated in b (:91-125); per-bucket edge and vertex counts
  updated per assignment (ebv_partitioner.hpp:25-40)

Distribution note (same as HDRF): the greedy stream carries global state, so
our distributed variant keeps PARTITION-LOCAL state per task after a global
degree-sum sort (range partitions preserve the ascending order within tasks).
RF is modestly higher than the single-threaded reference; balance holds.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import degrees as degrees_of


def _ebv_task(p: int, m_total: int, n_total: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        e_cnt = np.zeros(p, dtype=np.int64)
        v_cnt = np.zeros(p, dtype=np.int64)
        replicas: list[set[int]] = [set() for _ in range(p)]
        avg_e = m_total / p
        avg_v = 2.0 * n_total / p
        for pdf in batches:
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            out = np.empty(len(src), dtype=np.int64)
            for i in range(len(src)):
                u, v = int(src[i]), int(dst[i])
                best_b, best_s = 0, np.inf
                for b in range(p):
                    s = (u not in replicas[b]) + (v not in replicas[b])
                    s += e_cnt[b] / avg_e + v_cnt[b] / avg_v
                    if s < best_s:
                        best_s, best_b = s, b
                out[i] = best_b
                e_cnt[best_b] += 1
                if u not in replicas[best_b]:
                    replicas[best_b].add(u)
                    v_cnt[best_b] += 1
                if v not in replicas[best_b]:
                    replicas[best_b].add(v)
                    v_cnt[best_b] += 1
            yield pd.DataFrame({"src": src, "dst": dst, "bucket": out})

    return run


def ebv_partition(edges: DataFrame, p: int, deg: DataFrame | None = None) -> DataFrame:
    """(src, dst, bucket) — EBV with degree-sum-ordered streaming."""
    if deg is None:
        deg = degrees_of(edges)
    m = edges.count()
    n = deg.count()
    degb = F.broadcast(deg)
    e = (
        edges.join(degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
        .orderBy((F.col("deg_src") + F.col("deg_dst")).asc(), "src", "dst")
        .select("src", "dst")
    )
    return e.mapInPandas(_ebv_task(p, m, n), schema="src long, dst long, bucket long")
