#!/usr/bin/env python
"""Measure per-superstep shuffle bytes of the HyperANF distributed path,
packed vs unpacked (run manually; results -> BENCH/BASELINE.md r4 table).

Reads stage-level shuffle metrics from the local Spark UI REST API
(localhost:40xx/api/v1) before/after each 3-superstep run on the 5.9M-edge
scaling fixture, forced onto the shuffle path (broadcast_threshold=0)."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

FIX = "/tmp/smp_scaling"


def _ui_totals(spark) -> dict:
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/stages?status=complete") as r:
        stages = json.load(r)
    return {
        "shuffle_write": sum(s.get("shuffleWriteBytes", 0) for s in stages),
        "shuffle_read": sum(s.get("shuffleReadBytes", 0) for s in stages),
    }


def main() -> None:
    os.environ["SPARK_GRAFT_CPUS"] = "32"
    from split_merge_partitioner_spark.graph import hyperanf
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(
        app_name="hanf-shuffle",
        master="local[32]",
        extra_conf={"spark.ui.enabled": "true"},  # REST metrics source
    )
    edges = spark.read.parquet(f"{FIX}/edges.parquet").localCheckpoint(eager=True)
    n_steps = 3
    out = {}
    for packed in (False, True):
        t0 = _ui_totals(spark)
        w0 = time.monotonic()
        _, info = hyperanf(edges, n_steps=n_steps, stop_early=False,
                           broadcast_threshold=0, packed=packed)
        wall = time.monotonic() - w0
        t1 = _ui_totals(spark)
        key = "packed" if packed else "unpacked"
        out[key] = {
            "mode": info["mode"],
            "shuffle_write_bytes": t1["shuffle_write"] - t0["shuffle_write"],
            "shuffle_read_bytes": t1["shuffle_read"] - t0["shuffle_read"],
            "per_superstep_write_mb": round(
                (t1["shuffle_write"] - t0["shuffle_write"]) / n_steps / 1e6, 1
            ),
            "wall_sec": round(wall, 2),
        }
        print(json.dumps({key: out[key]}), flush=True)
    ratio = (
        out["unpacked"]["shuffle_write_bytes"]
        / max(out["packed"]["shuffle_write_bytes"], 1)
    )
    print(json.dumps({"write_bytes_ratio_unpacked_over_packed": round(ratio, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
