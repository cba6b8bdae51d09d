#!/usr/bin/env python
"""Sustained scaling measurement (run manually; results -> BENCH/BASELINE.md).

The sandbox host shows CPU frequency ramping + minute-scale interference, so
each sample must be a sustained (>60 s) run and configs are interleaved with
best-of-N.  Measures PageRank supersteps on the deterministic scaling fixture
(powerlaw n=500k, ~5.9M edges; bench.py --scaling prepares it)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from split_merge_partitioner_spark.graph import pagerank  # noqa: E402
from split_merge_partitioner_spark.session import get_spark  # noqa: E402

FIX = "/tmp/smp_scaling"
N_ITER = 30


def sample(cpus: int, thr: int) -> float:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    spark = get_spark(app_name=f"scale-{cpus}", master=f"local[{cpus}]")
    edges = spark.read.parquet(f"{FIX}/edges.parquet").localCheckpoint(eager=True)
    assigned = spark.read.parquet(f"{FIX}/assigned.parquet").localCheckpoint(eager=True)
    # warm-up block
    pagerank(edges, assigned=assigned, mode="gas", tol=0.0, max_iter=5, broadcast_threshold=thr)
    t0 = time.monotonic()
    pagerank(edges, assigned=assigned, mode="gas", tol=0.0, max_iter=N_ITER, broadcast_threshold=thr)
    dt = time.monotonic() - t0
    spark.stop()
    return dt


def main() -> None:
    results: dict[str, list[float]] = {}
    # interleaved: (cpus, broadcast?) rounds
    plan = [(32, 1), (8, 1), (32, 0), (8, 0)] * 2
    for cpus, bc in plan:
        thr = 5_000_000 if bc else 0
        key = f"local{cpus}_{'bcast' if bc else 'shuffle'}"
        dt = sample(cpus, thr)
        results.setdefault(key, []).append(round(dt, 1))
        print(json.dumps({key: results[key]}), flush=True)
    out = {k: min(v) for k, v in results.items()}
    m = 5913203
    for mode in ("bcast", "shuffle"):
        t8, t32 = out[f"local8_{mode}"], out[f"local32_{mode}"]
        eff = (m * N_ITER / t32) / (4 * (m * N_ITER / t8))
        print(json.dumps({
            "mode": mode,
            "sec_local8": t8,
            "sec_local32": t32,
            "eff": round(eff, 3),
            "eps_local32": round(m * N_ITER / t32, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
