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


def vertex_partition_by_hash(edges: DataFrame, p: int) -> DataFrame:
    """Trivial baseline vertex partition (vertex, bucket) = hash(vertex) % p —
    stands in for the external METIS partition in the v2e pipeline."""
    from ..sources.edges import vertices_of

    return vertices_of(edges).select(
        "vertex", F.pmod(F.xxhash64("vertex", F.lit(3)), F.lit(p)).cast("long").alias("bucket")
    )


def vertex2edge_partition(
    edges: DataFrame, vertex_parts: DataFrame, seed: int = 42
) -> DataFrame:
    """Assign each edge to one endpoint's vertex-bucket, chosen by a seeded
    hash (reproducible version of the reference's coin flip,
    vertex2edgepart.cpp:70-75).  Returns (src, dst, bucket)."""
    vp = F.broadcast(vertex_parts)
    e = (
        edges.join(vp.withColumnRenamed("vertex", "src").withColumnRenamed("bucket", "b_src"), "src")
        .join(vp.withColumnRenamed("vertex", "dst").withColumnRenamed("bucket", "b_dst"), "dst")
    )
    pick_src = F.pmod(F.xxhash64("src", "dst", F.lit(seed)), F.lit(2)) == 0
    return e.select(
        "src", "dst", F.when(pick_src, F.col("b_src")).otherwise(F.col("b_dst")).alias("bucket")
    )


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
