"""Vertex-partition interop: vertex->edge partition conversion and
vertex-partition statistics.

Reference parity:
- Vertex2EdgePart (`-method v2e_*`): reads an external vertex partition and
  assigns each edge to one endpoint's bucket — the reference flips a coin
  (/root/reference/src/vertex2edgepart.cpp:61-76); we use a seeded hash so
  the conversion is reproducible (SURVEY.md §2.2 P13 note).
- VertexPartitioner::calculate_stats: balance + Jain's fairness index +
  edge-cut ratio (/root/reference/src/partitioner.hpp:104-166; Jain's
  src/util.hpp:88-103; cut ratio :163-165).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def vertex_partition_by_hash(edges: DataFrame, p: int) -> DataFrame:
    """Trivial baseline vertex partition (vertex, bucket) = hash(vertex) % p —
    stands in for the external METIS partition in the v2e pipeline."""
    from ..sources.edges import vertices_of

    return vertices_of(edges).select(
        "vertex", F.pmod(F.xxhash64("vertex", F.lit(3)), F.lit(p)).cast("long").alias("bucket")
    )


def vertex2edge_partition(
    edges: DataFrame, vertex_parts: DataFrame, seed: int = 42, choice: str = "hash"
) -> DataFrame:
    """Assign each edge to one endpoint's vertex-bucket, chosen by a seeded
    hash (reproducible version of the reference's coin flip,
    vertex2edgepart.cpp:70-75).  Returns (src, dst, bucket).

    choice="hash" (default): seeded xxhash64 endpoint pick.
    choice="parity": pick src when (src+dst) is even — ANSI-SQL-portable, so
    the conversion mechanics earn a cross-engine oracle (the pick rule is
    arbitrary by the reference's own contract: it flips a coin)."""
    vp = F.broadcast(vertex_parts)
    e = (
        edges.join(vp.withColumnRenamed("vertex", "src").withColumnRenamed("bucket", "b_src"), "src")
        .join(vp.withColumnRenamed("vertex", "dst").withColumnRenamed("bucket", "b_dst"), "dst")
    )
    if choice == "parity":
        pick_src = F.pmod(F.col("src") + F.col("dst"), F.lit(2)) == 0
    else:
        pick_src = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(2)) == 0
    return e.select(
        "src", "dst", F.when(pick_src, F.col("b_src")).otherwise(F.col("b_dst")).alias("bucket")
    )


def vertex2edge_partition_ksplit(
    edges: DataFrame,
    vertex_parts_kp: DataFrame,
    p: int,
    k: int,
    merge: str = "precise",
    merge_stats: str = "auto",
    seed: int = 42,
) -> DataFrame:
    """v2e with k-split merging (vertex2edgepart.hpp:133-226 +
    vertex2edgepart.cpp:79-126): the vertex partition has k*p buckets; build
    per-bucket EDGE sets (is_mirror over edges — an edge is mirrored in the
    bucket of each endpoint, hpp:163-167/210-216), greedily merge the k*p
    buckets down to p with the SAME fast/precise greedy as FSM but over
    edge-set stats (replicas = edge-set popcount, occupied = vertex count,
    cpp:82-104), remap the vertex partition through the merge map, then assign
    each edge to a seeded-hash endpoint's FINAL bucket (the reference flips a
    coin, cpp:61-76 — seeded hash for reproducibility).

    Edge identity in the mirror relation is xxhash64(src, dst) — exact at
    fixture scale; at 10^12 edges the ~2^-64 pairwise collision rate perturbs
    merge stats immaterially (documented deviation).

    Returns (src, dst, bucket) with bucket in [0, p)."""
    from .fsm import build_merge_stats, fast_merge, precise_merge

    spark = edges.sparkSession
    n_sub = p * k
    vp = F.broadcast(vertex_parts_kp)
    e = (
        edges.join(vp.withColumnRenamed("vertex", "src").withColumnRenamed("bucket", "b_src"), "src")
        .join(vp.withColumnRenamed("vertex", "dst").withColumnRenamed("bucket", "b_dst"), "dst")
        .withColumn("ek", F.xxhash64("src", "dst"))
        .localCheckpoint(eager=True)
    )
    mirror = (
        e.select(F.col("b_src").alias("bucket"), F.col("ek").alias("vertex"))
        .unionAll(e.select(F.col("b_dst").alias("bucket"), F.col("ek").alias("vertex")))
        .distinct()
        .persist()
    )
    occ_rows = vertex_parts_kp.groupBy("bucket").agg(F.count(F.lit(1)).alias("n")).collect()
    occupied = {b: 0 for b in range(n_sub)}
    occupied.update({int(r["bucket"]): int(r["n"]) for r in occ_rows})
    stats, replicas = build_merge_stats(mirror, n_sub, occupied, merge_stats)
    order = sorted(range(n_sub), key=lambda b: (-replicas[b], b))
    if merge == "fast":
        valid = fast_merge(order, stats, p, k)
    elif merge == "precise":
        valid = precise_merge(order, stats, p, k)
    else:
        raise ValueError(f"unknown merge {merge!r}")
    release(mirror)
    map_df = F.broadcast(
        spark.createDataFrame(
            [(int(o), int(nb)) for o, nb in valid.items()], "bucket long, final long"
        )
    )
    final_vp = vertex_parts_kp.join(map_df, "bucket").select(
        "vertex", F.col("final").alias("bucket")
    )
    return vertex2edge_partition(edges, final_vp, seed=seed)


def vertex_partition_stats(
    edges: DataFrame, vertex_parts: DataFrame, p: int
) -> DataFrame:
    """One-row metrics for a vertex partition (edge-cut model):
    balance = max|V_b|/(n/p), jains_v, and cut_ratio = fraction of edges whose
    endpoints live in different buckets (partitioner.hpp:163-165 computes
    (sum|E_b| - m)/m where E_b counts edges incident to the bucket — identical
    to the crossing-edge fraction)."""
    vp = F.broadcast(vertex_parts)
    sizes = vertex_parts.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vertices"))
    n = vertex_parts.count()
    m = edges.count()
    e = (
        edges.join(vp.withColumnRenamed("vertex", "src").withColumnRenamed("bucket", "b_src"), "src")
        .join(vp.withColumnRenamed("vertex", "dst").withColumnRenamed("bucket", "b_dst"), "dst")
    )
    cut = e.where(F.col("b_src") != F.col("b_dst")).count()
    return sizes.agg(
        (F.max("n_vertices") / F.lit(n / p)).alias("balance"),
        (
            (F.sum("n_vertices") * F.sum("n_vertices"))
            / (F.count(F.lit(1)) * F.sum(F.col("n_vertices") * F.col("n_vertices")))
        ).alias("jains_v"),
        (F.lit(float(cut)) / F.lit(float(m))).alias("cut_ratio"),
    )
