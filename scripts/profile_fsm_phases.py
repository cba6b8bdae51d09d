#!/usr/bin/env python
"""Phase-by-phase replica of fsm_partition(p=32, k=2, merge=fast,
splitter=hep_local) with timers (measurement only — mirrors operators/fsm.py;
drift risk accepted for profiling)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    import numpy as np
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.operators.fsm import (
        DEFAULT_HDF,
        _BitmapMergeStats,
        _split_hep_local,
        fast_merge,
    )
    from split_merge_partitioner_spark.session import get_spark
    from split_merge_partitioner_spark.sources import edges_from_lineitem
    from split_merge_partitioner_spark.sources.edges import degrees as degrees_of

    spark = get_spark(app_name="smp-profile-fsm", master="local[32]")
    out = {}
    t0 = time.monotonic()
    edges = edges_from_lineitem(spark, SF_DIR).persist()
    m = edges.count()
    out["edge_derivation"] = round(time.monotonic() - t0, 3)

    p, k = 32, 2
    n_sub = p * k
    t0 = time.monotonic()
    deg = degrees_of(edges).localCheckpoint(eager=True)
    out["degrees_ckpt"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    avg_deg_row = deg.agg(F.avg("degree").alias("a"), F.sum("degree").alias("s")).collect()[0]
    out["avg_agg"] = round(time.monotonic() - t0, 3)
    high_threshold = DEFAULT_HDF * float(avg_deg_row["a"])
    m_edges = int(avg_deg_row["s"]) // 2
    n_groups = p

    t0 = time.monotonic()
    degb = F.broadcast(deg)
    e = (
        edges.join(degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
    ).persist()
    is_h2h = (F.col("deg_src") > high_threshold) & (F.col("deg_dst") > high_threshold)
    low = e.where(~is_h2h)
    h2h = e.where(is_h2h)
    out["degree_join_build"] = round(time.monotonic() - t0, 3)

    # split into: quantile job vs applyInPandas job
    from split_merge_partitioner_spark.operators.fsm import _locality_grouped, _hep_lite_group, _NE_SCHEMA

    t0 = time.monotonic()
    grouped = _locality_grouped(low, n_groups, "range")
    out["quantile"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    low_assigned = (
        grouped.select("grp", "src", "dst", "deg_src", "deg_dst")
        .groupBy("grp")
        .applyInPandas(_hep_lite_group(k, high_threshold, p=p, n_groups=n_groups), schema=_NE_SCHEMA)
    )
    h2h_hash = F.pmod(F.xxhash64("src", "dst", F.lit(11)), F.lit(n_sub))
    h2h_assigned = h2h.select("src", "dst", h2h_hash.cast("long").alias("bucket"))
    sub_assigned = low_assigned.unionAll(h2h_assigned).localCheckpoint(eager=True)
    out["split_ckpt"] = round(time.monotonic() - t0, 3)
    e.unpersist()

    t0 = time.monotonic()
    pair_pdf = (
        sub_assigned.select("bucket", F.explode(F.array("src", "dst")).alias("vertex"))
        .groupBy("bucket", "vertex")
        .agg(F.count(F.lit(1)).alias("c"))
        .toPandas()
    )
    out["merge_stats_agg_toPandas"] = round(time.monotonic() - t0, 3)
    t0 = time.monotonic()
    by_bucket = pair_pdf.groupby("bucket")
    occupied = {old_id: 0 for old_id in range(n_sub)}
    occupied.update({int(b): int(c) // 2 for b, c in by_bucket["c"].sum().items()})
    replicas = {old_id: 0 for old_id in range(n_sub)}
    replicas.update({int(b): int(s) for b, s in by_bucket.size().items()})
    verts = np.unique(pair_pdf["vertex"].to_numpy(np.int64))
    vidx = {int(v): i for i, v in enumerate(verts)}
    members = {int(b): v.to_numpy(np.int64) for b, v in by_bucket["vertex"]}
    bitmaps = {}
    for old_id in range(n_sub):
        bm = np.zeros(len(verts), dtype=bool)
        mem = members.get(old_id)
        if mem is not None:
            bm[[vidx[int(v)] for v in mem]] = True
        bitmaps[old_id] = bm
    stats = _BitmapMergeStats(replicas, occupied, bitmaps)
    out["bitmap_build_driver"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    order = sorted(range(n_sub), key=lambda b: (-replicas[b], b))
    valid = fast_merge(order, stats, p, k)
    out["greedy"] = round(time.monotonic() - t0, 3)

    t0 = time.monotonic()
    map_df = F.broadcast(
        spark.createDataFrame(
            [(int(o), int(nb)) for o, nb in valid.items()], "bucket long, final long"
        )
    )
    assigned = (
        sub_assigned.join(map_df, "bucket")
        .select("src", "dst", F.col("final").alias("bucket"))
    ).persist()
    assigned.count()
    out["remap_persist_count"] = round(time.monotonic() - t0, 3)
    out["m"] = m
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
