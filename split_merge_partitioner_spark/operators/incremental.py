"""Incremental edge-partition routing — the daily-update path.

The reference partitioners (FSM, HDRF, DBH, ... src/main.cpp) are one-shot:
a new batch of edges means re-partitioning the whole graph.  At 100 TB that
is the wrong loop — the daily delta is orders of magnitude smaller than the
base, and the base assignment is already sunk cost.  This operator routes a
DELTA batch of edges onto an EXISTING assignment, replica-affinity first
(the idea behind Leopard's dynamic placement, Huang & Abadi VLDB'16, and
HDRF's replication term), without touching base rows: the companion of
`graph/components.py::connected_components_incremental` on the partitioning
side.

Batch-stationary semantics (the property that makes it Spark-native): every
delta edge is scored against the BASE state only — not against placements of
other delta edges.  Sequential streaming partitioners thread a mutable state
through every edge, which serializes the stream and makes results depend on
arrival order; batch-stationary routing is embarrassingly parallel, bit-
stable under repartition/retry/scale-out, and exactly replayable in ANSI SQL
(the whole rule is one window function).  The price is that intra-delta
affinity is ignored — bounded by the delta/base ratio, and re-running FSM
weekly resets any drift (documented operating model).

Routing rule, per delta edge (u, v):
  1. candidates = buckets already holding a replica of u or of v;
     score(b) = |{u, v} ∩ replicas(b)| ∈ {1, 2} — prefer 2 (no new replica)
     over 1 (one new replica);
  2. ties break toward the bucket with the SMALLER base edge load, then the
     smaller bucket id (deterministic total order);
  3. no candidate at all (both endpoints unseen): fall back to DBH on base
     degrees — hash the lower-base-degree endpoint (ties to src, matching
     src/dbh_partitioner.cpp:80-83; unseen degree = 0).

Plan: one distinct over the doubled base assignment (replica table, n·RF
rows), two co-partitioned shuffle joins of the delta against it, one
map-side-combined score groupBy, one window per delta edge, and a p-row
broadcast of base loads.  Nothing scans the base edge rows more than once
and nothing is proportional to |base| × |delta|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def incremental_edge_assign(
    base_parts: DataFrame, delta_edges: DataFrame, p: int
) -> DataFrame:
    """Route ``delta_edges`` (src, dst) onto the existing ``base_parts``
    (src, dst, bucket) assignment; returns (src, dst, bucket) for the delta
    only (the base is immutable by contract)."""
    if p < 1:
        raise ValueError("p must be >= 1")
    hi = base_parts.agg(F.max("bucket").alias("mx")).collect()[0]["mx"]
    if hi is not None and hi >= p:
        raise ValueError(
            f"base assignment uses bucket {hi} >= p={p}; pass the p the base "
            "was partitioned with"
        )
    reps = (
        base_parts.select(F.col("src").alias("vertex"), "bucket")
        .unionAll(base_parts.select(F.col("dst").alias("vertex"), "bucket"))
        .dropDuplicates(["vertex", "bucket"])
    )
    loads = base_parts.groupBy("bucket").agg(F.count(F.lit(1)).alias("load"))
    base_deg = (
        base_parts.select(F.col("src").alias("vertex"))
        .unionAll(base_parts.select(F.col("dst").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    delta = delta_edges.select("src", "dst")
    cand = delta.join(
        reps.withColumnRenamed("vertex", "src"), "src"
    ).select("src", "dst", "bucket").unionAll(
        delta.join(reps.withColumnRenamed("vertex", "dst"), "dst").select(
            "src", "dst", "bucket"
        )
    )
    scored = (
        cand.groupBy("src", "dst", "bucket")
        .agg(F.count(F.lit(1)).alias("score"))
        .join(F.broadcast(loads), "bucket", "left")
    )
    w = Window.partitionBy("src", "dst").orderBy(
        F.col("score").desc(), F.col("load").asc(), F.col("bucket").asc()
    )
    routed = (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("src", "dst", F.col("bucket").cast("long").alias("bucket"))
    )
    # both endpoints unseen -> DBH fallback on base degrees (0 when absent)
    fresh = delta.join(routed.select("src", "dst"), ["src", "dst"], "left_anti")
    dsrc = base_deg.withColumnRenamed("vertex", "src").withColumnRenamed(
        "degree", "deg_src"
    )
    ddst = base_deg.withColumnRenamed("vertex", "dst").withColumnRenamed(
        "degree", "deg_dst"
    )
    fb = (
        fresh.join(dsrc, "src", "left")
        .join(ddst, "dst", "left")
        .select(
            "src",
            "dst",
            F.coalesce("deg_src", F.lit(0)).alias("du"),
            F.coalesce("deg_dst", F.lit(0)).alias("dv"),
        )
    )
    wcol = F.when(F.col("du") <= F.col("dv"), F.col("src")).otherwise(F.col("dst"))
    fallback = fb.select(
        "src", "dst", F.pmod(wcol, F.lit(p)).cast("long").alias("bucket")
    )
    return routed.unionAll(fallback)
