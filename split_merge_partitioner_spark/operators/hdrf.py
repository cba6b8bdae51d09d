"""HDRF (High-Degree Replicated First) streaming partitioner.

Reference parity (/root/reference/src/hdrf_partitioner.cpp):
- score(u,v,b) = g_u + g_v + lambda * (max_size - |b|)/(1 + max_size - min_size)
  where g_x = 1 + (1 - deg_x/(deg_u+deg_v)) if x already replicated in b else 0
  (compute_partition_score :150-174; best_scored_partition :136-148)
- hard capacity cut-off: a bucket at capacity scores -1 and is never chosen
  (hdrf_partitioner.cpp:152-154; capacity = 1.05*m/p + 1)
- lambda default 1.1 (src/main.cpp:32, hdrf_partitioner.hpp:22)

HDRF is inherently sequential (global replica-set + size state).  The standard
distributed practice — and ours — is PARTITION-LOCAL state: each Spark task
streams its edge batch through an independent HDRF state machine writing into
the same global bucket space [0, p).  Documented deviations:
- replica sets are per-task, so RF is slightly higher than single-threaded
  HDRF; balance is preserved because every task balances its own stream.
- the capacity bound is self-normalizing (1.05 * stream_position / p + 1, vs
  the reference's fixed 1.05*m/p + 1 which needs m upfront) so the same
  relative bound holds per task whatever the task count.
- when every bucket is at capacity the reference picks a random bucket
  (best_scored_partition :145-147); we pick the current min-size bucket
  (deterministic — reproducibility requirement, SURVEY.md §7).

The scoring kernel is fully vectorized over the p buckets: per-vertex
replica membership is a bool[p] row in a dict, and the score for all p
buckets is one NumPy expression — no Python loop over p per edge.

Blocked variant (the default, ``block_size`` knob): edges are scored in
blocks of B against the replica/balance state FROZEN at block start — one
(B x p) NumPy expression per block instead of ~8 p-vector ops per edge —
while the HARD capacity check and the all-full fallback stay LIVE per edge
(each edge takes its best under-capacity bucket in frozen-score order), so
the reference's balance guarantee (the 1.05 cap, hdrf_partitioner.cpp:49)
is never violated by stale sizes.  block_size=1 reproduces the per-edge
reference semantics exactly (tested equivalent in
tests/test_stream_kernels.py); larger blocks are a documented deviation —
the reference itself is stream-order-sensitive, so block-boundary state is
a legitimate stream variant.  ~8-12x kernel wall-clock on the zipf
fixture (BENCH/METHODS.md; RF within 1% of reference semantics at the
default block size).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

DEFAULT_LAMBDA = 1.1
# the reference's hard cap is num_edges * 1.0 / p + 1 (hdrf_partitioner.cpp:49),
# binding only at stream end; our running-position analog needs slack or it
# degenerates to round-robin, so we allow 5% over the running average
CAP_RATIO = 1.05

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
        rep: dict[int, np.ndarray] = {}  # vertex -> bool[p] membership row
        no_rep = np.zeros(p, dtype=bool)
        seen = 0
        for pdf in batches:
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            du = pdf["deg_src"].to_numpy(np.float64)
            dv = pdf["deg_dst"].to_numpy(np.float64)
            out = np.empty(len(src), dtype=np.int64)
            for i in range(len(src)):
                u, v = int(src[i]), int(dst[i])
                degsum = du[i] + dv[i]
                gu_in = 2.0 - du[i] / degsum
                gv_in = 2.0 - dv[i] / degsum
                mu = rep.get(u, no_rep)
                mv = rep.get(v, no_rep)
                mx = sizes.max()
                s = lam * (mx - sizes) / (1.0 + mx - sizes.min())
                s += gu_in * mu
                s += gv_in * mv
                cap = CAP_RATIO * max(seen, p) / p + 1.0
                s[sizes >= cap] = -1.0
                if s.max() < 0.0:
                    best_b = int(sizes.argmin())
                else:
                    best_b = int(s.argmax())
                out[i] = best_b
                sizes[best_b] += 1
                seen += 1
                if not mu[best_b]:
                    if u not in rep:
                        rep[u] = mu = no_rep.copy()
                    mu[best_b] = True
                if not mv[best_b]:
                    if v not in rep:
                        rep[v] = mv = no_rep.copy()
                    mv[best_b] = True
            yield pd.DataFrame({"src": src, "dst": dst, "bucket": out})

    return run


def _hdrf_task_blocked(p: int, lam: float, block_size: int):
    """Blocked stream kernel (module docstring): replica masks are uint64
    bitmasks (requires p <= 64); scores for a whole block come from ONE
    (B x p) NumPy expression over block-start state; per-edge work is a dict
    lookup, a candidate walk in frozen-score order until an under-capacity
    bucket is found (live sizes), and one scalar size bump."""
    assert p <= 64, "blocked kernel packs membership in uint64 (use block_size=1 beyond)"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bits = np.arange(p, dtype=np.uint64)
        sizes: list[int] = [0] * p  # plain ints: the per-edge walk is pure Python
        rep: dict[int, int] = {}  # vertex -> bucket bitmask
        seen = 0
        inv_p = CAP_RATIO / p
        for pdf in batches:
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
            du_all = pdf["deg_src"].to_numpy(np.float64)
            dv_all = pdf["deg_dst"].to_numpy(np.float64)
            out = np.empty(len(src), dtype=np.int64)
            get = rep.get
            for lo in range(0, len(src), block_size):
                hi = min(lo + block_size, len(src))
                du, dv = du_all[lo:hi], dv_all[lo:hi]
                degsum = du + dv
                # frozen block-start state: balance term + replica terms as
                # one (B, p) expression (compute_partition_score :150-174)
                sz = np.asarray(sizes, dtype=np.int64)
                mx = sz.max()
                bal = lam * (mx - sz) / (1.0 + mx - sz.min())
                ulist = src[lo:hi].tolist()
                vlist = dst[lo:hi].tolist()
                mu = np.fromiter((get(u, 0) for u in ulist), np.uint64, hi - lo)
                mv = np.fromiter((get(v, 0) for v in vlist), np.uint64, hi - lo)
                s = bal[None, :] + ((2.0 - du / degsum)[:, None]) * (
                    (mu[:, None] >> bits[None, :]) & np.uint64(1)
                ).astype(np.float64)
                s += ((2.0 - dv / degsum)[:, None]) * (
                    (mv[:, None] >> bits[None, :]) & np.uint64(1)
                ).astype(np.float64)
                # frozen-score argmax per row (vectorized); the full
                # preference order is materialized LAZILY per row only when
                # the top choice is at capacity (rare: the cap has 5% slack).
                # Scores are >= 0, so "first under-capacity candidate in
                # desc-stable order" == the per-edge masked argmax.
                top = np.argmax(s, axis=1).tolist()
                obuf = [0] * (hi - lo)
                for i in range(hi - lo):
                    cap = (seen if seen > p else p) * inv_p + 1.0
                    best_b = top[i]
                    if sizes[best_b] >= cap:
                        best_b = -1
                        for b in np.argsort(-s[i], kind="stable").tolist():
                            if sizes[b] < cap:
                                best_b = b
                                break
                        if best_b < 0:  # every bucket at capacity
                            best_b = sizes.index(min(sizes))
                    obuf[i] = best_b
                    sizes[best_b] += 1
                    seen += 1
                    u, v = ulist[i], vlist[i]
                    bbit = 1 << best_b
                    rep[u] = get(u, 0) | bbit
                    rep[v] = get(v, 0) | bbit
                out[lo:hi] = obuf
            yield pd.DataFrame({"src": src, "dst": dst, "bucket": out})

    return run


def hdrf_partition(
    edges: DataFrame,
    p: int,
    deg: DataFrame | None = None,
    lam: float = DEFAULT_LAMBDA,
    num_streams: int | None = None,
    block_size: int = 256,
) -> DataFrame:
    """Partition-local HDRF.  edges: (src, dst); returns (src, dst, bucket).

    block_size: scoring-state refresh granularity (module docstring).  1 =
    exact reference per-edge semantics; the default 256 freezes the
    replica/balance score between refreshes (capacity stays live) for
    ~8-12x kernel throughput at RF within ~1% of reference semantics on the
    zipf fixture (256 dominates 4096 on BOTH axes there: less staleness =
    fewer capacity-fallback row sorts AND better scores).  p > 64 falls back to the per-edge kernel."""
    from ..sources.edges import degrees as degrees_of

    if deg is None:
        # materialized: the degree agg feeds BOTH endpoint joins
        deg = degrees_of(edges).localCheckpoint(eager=True)
    degb = F.broadcast(deg)
    e = (
        edges.join(degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
        .select("src", "dst", "deg_src", "deg_dst")
    )
    if num_streams:
        e = e.repartition(num_streams, F.pmod(F.xxhash64("src", "dst"), F.lit(num_streams)))
    kernel = (
        _hdrf_task(p, lam)
        if (block_size <= 1 or p > 64)
        else _hdrf_task_blocked(p, lam, block_size)
    )
    return e.mapInPandas(kernel, schema=_SCHEMA)
