#!/usr/bin/env python
"""N -> 4N scaling of the distributed PageRank superstep (run manually;
results -> BENCH/BASELINE.md).

Protocol (the round-3 precedent, BENCH/BASELINE.md "Scaling evidence"):
the 23.9M-edge fixture (bench.py prepares /tmp/smp_scaling_large), a 2-
superstep warm-up then a measured 6-superstep run, configs interleaved
best-of-2, and a single-threaded NumPy matmul probe between samples so
every figure carries its host-window context (healthy ~0.31 s; the
sandbox hypervisor throttles multi-thread grants unpredictably).

Usage: python scripts/measure_jvm_scaling.py [combine] [lo] [hi]
       (defaults: jvm 2 8)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIX = "/tmp/smp_scaling_large"
M_EDGES = 23_894_834


def probe() -> float:
    os.environ.setdefault("OMP_NUM_THREADS", "1")
    a = np.random.default_rng(1).random((2000, 2000))
    t0 = time.monotonic()
    for _ in range(5):
        a @ a
    return round(time.monotonic() - t0, 2)


def run(cpus: int, combine: str, n_iter: int = 6) -> float:
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    from split_merge_partitioner_spark.graph import pagerank
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(app_name=f"sc-{combine}-{cpus}", master=f"local[{cpus}]")
    edges = spark.read.parquet(f"{FIX}/edges.parquet").localCheckpoint(eager=True)
    assigned = spark.read.parquet(f"{FIX}/assigned.parquet").localCheckpoint(eager=True)
    pagerank(edges, assigned=assigned, mode="gas", tol=0.0, max_iter=2, combine=combine)
    _, info = pagerank(
        edges, assigned=assigned, mode="gas", tol=0.0, max_iter=n_iter, combine=combine
    )
    spark.stop()
    return M_EDGES * n_iter / info["superstep_seconds"]


def main() -> None:
    combine = sys.argv[1] if len(sys.argv) > 1 else "jvm"
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    results: dict[int, list[float]] = {}
    print("probe_start", probe(), flush=True)
    for cpus in (lo, hi, lo, hi):
        tp = run(cpus, combine)
        results.setdefault(cpus, []).append(round(tp / 1e6, 3))
        print(cpus, results[cpus], "probe", probe(), flush=True)
    best = {k: max(v) for k, v in results.items()}
    eff = best[hi] / ((hi / lo) * best[lo])
    print(json.dumps({
        "combine": combine,
        "best_m_eps": best,
        f"eff_{lo}_to_{hi}": round(eff, 3),
    }))


if __name__ == "__main__":
    main()
