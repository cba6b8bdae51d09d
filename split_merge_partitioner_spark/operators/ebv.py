"""EBV (Efficient and Balanced Vertex-cut) streaming partitioner.

Reference parity (/root/reference/src/ebv_partitioner.cpp):
- edges sorted by deg(u)+deg(v) ascending before streaming (:69-73)
- per edge: argmin_b (s_u + s_v) + |b|_e/avg_e + |b|_v/avg_v where s_x = 1
  iff x NOT yet replicated in b (:91-125); avg_v is DYNAMIC — the running
  replica total across all buckets divided by p (num_vertices_all_buckets,
  ebv_partitioner.hpp:25-40 assign_edge increments it per new replica)
- per-bucket edge and vertex counts updated per assignment
  (ebv_partitioner.hpp:25-40)

Distribution note (same as HDRF): the greedy stream carries global state, so
our distributed variant keeps PARTITION-LOCAL state per task after a global
degree-sum sort (range partitions preserve the ascending order within tasks).
Documented deviations: replica sets are per-task (RF modestly higher than the
single-threaded reference; balance holds), and avg_e normalizes by the
task-local running edge count (seen/p) rather than the global m/p the
single-process reference knows upfront — the reference's avg_e is constant
ONLY because it sees the whole stream; per task the running average is the
faithful analog and keeps the balance term at the same magnitude as s_u+s_v.

Scoring is vectorized over the p buckets (bool[p] membership rows + one NumPy
expression per edge) — no Python loop over p.

Blocked variant (the default, ``block_size`` knob — the hdrf.py recipe):
edges are scored in blocks of B against replica/balance state FROZEN at
block start — membership as uint64 bitmasks, the whole block's scores ONE
(B x p) NumPy expression, per-edge work an argmin read plus live
e_cnt/v_cnt/replica updates.  EBV has no hard capacity cut-off (the balance
terms are soft), so the per-edge step is pure bookkeeping.  block_size=1
reproduces the per-edge kernel exactly (tested); p > 64 falls back to the
per-edge kernel.  Measured quality cost of the frozen replica masks (zipf
n=50k m=400k, p=32, single stream): RF 3.72 -> 3.88 (~4.5%), flat in block
size from 32 up, for ~4x kernel wall-clock — pass block_size=1 when RF
matters more than throughput (BENCH/METHODS.md tracks the partition-local
deployment's numbers).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import degrees as degrees_of


def _ebv_task(p: int):
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        e_cnt = np.zeros(p, dtype=np.int64)
        v_cnt = np.zeros(p, dtype=np.int64)
        rep: dict[int, np.ndarray] = {}  # vertex -> bool[p]
        no_rep = np.zeros(p, dtype=bool)
        seen = 0
        total_replicas = 0  # num_vertices_all_buckets (ebv_partitioner.hpp:23)
        for pdf in batches:
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            out = np.empty(len(src), dtype=np.int64)
            for i in range(len(src)):
                u, v = int(src[i]), int(dst[i])
                mu = rep.get(u, no_rep)
                mv = rep.get(v, no_rep)
                avg_e = max(seen, 1) / p
                avg_v = max(total_replicas, 1) / p
                s = 2.0 - mu - mv
                s += e_cnt / avg_e
                s += v_cnt / avg_v
                best_b = int(s.argmin())
                out[i] = best_b
                e_cnt[best_b] += 1
                seen += 1
                if not mu[best_b]:
                    if u not in rep:
                        rep[u] = mu = no_rep.copy()
                    mu[best_b] = True
                    v_cnt[best_b] += 1
                    total_replicas += 1
                if not mv[best_b]:
                    if v not in rep:
                        rep[v] = mv = no_rep.copy()
                    mv[best_b] = True
                    v_cnt[best_b] += 1
                    total_replicas += 1
            yield pd.DataFrame({"src": src, "dst": dst, "bucket": out})

    return run


def _ebv_task_blocked(p: int, block_size: int):
    """Blocked stream kernel (module docstring)."""
    assert p <= 64, "blocked kernel packs membership in uint64 (use block_size=1 beyond)"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(p, dtype=np.uint64)
        e_cnt = np.zeros(p, dtype=np.int64)
        v_cnt = np.zeros(p, dtype=np.int64)
        rep: dict[int, int] = {}  # vertex -> bucket bitmask
        seen = 0
        total_replicas = 0
        get = rep.get
        for pdf in batches:
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            out = np.empty(len(src), dtype=np.int64)
            for lo in range(0, len(src), block_size):
                hi = min(lo + block_size, len(src))
                ulist = src[lo:hi].tolist()
                vlist = dst[lo:hi].tolist()
                mu = np.fromiter((get(u, 0) for u in ulist), np.uint64, hi - lo)
                mv = np.fromiter((get(v, 0) for v in vlist), np.uint64, hi - lo)
                # frozen block-start state: replica terms (2 - mu - mv) +
                # both balance terms, one (B, p) expression (:91-125)
                avg_e = max(seen, 1) / p
                avg_v = max(total_replicas, 1) / p
                bal = e_cnt / avg_e + v_cnt / avg_v
                s = (
                    (bal[None, :] + 2.0)
                    - ((mu[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.float64)
                    - ((mv[:, None] >> bits[None, :]) & np.uint64(1)).astype(np.float64)
                )
                best = np.argmin(s, axis=1).tolist()
                for i in range(hi - lo):
                    b = best[i]
                    out[lo + i] = b
                    e_cnt[b] += 1
                    seen += 1
                    u, v = ulist[i], vlist[i]
                    bbit = 1 << b
                    m_u = get(u, 0)
                    if not m_u & bbit:
                        rep[u] = m_u | bbit
                        v_cnt[b] += 1
                        total_replicas += 1
                    m_v = get(v, 0)
                    if not m_v & bbit:
                        rep[v] = m_v | bbit
                        v_cnt[b] += 1
                        total_replicas += 1
            yield pd.DataFrame({"src": src, "dst": dst, "bucket": out})

    return run


def ebv_partition(
    edges: DataFrame, p: int, deg: DataFrame | None = None, block_size: int = 256
) -> DataFrame:
    """(src, dst, bucket) — EBV with degree-sum-ordered streaming.
    block_size: scoring-state refresh granularity (module docstring);
    1 = exact per-edge reference semantics."""
    if deg is None:
        # materialized: the degree agg feeds BOTH endpoint joins
        deg = degrees_of(edges).localCheckpoint(eager=True)
    degb = F.broadcast(deg)
    e = (
        edges.join(degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
        .orderBy((F.col("deg_src") + F.col("deg_dst")).asc(), "src", "dst")
        .select("src", "dst")
    )
    kernel = (
        _ebv_task(p)
        if (block_size <= 1 or p > 64)
        else _ebv_task_blocked(p, block_size)
    )
    return e.mapInPandas(kernel, schema="src long, dst long, bucket long")
