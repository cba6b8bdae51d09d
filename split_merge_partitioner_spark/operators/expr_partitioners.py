"""Streaming-hash partitioners as pure Catalyst expressions (no UDF, no state).

These are the reference's embarrassingly-parallel baselines; in Spark they are
single whole-stage-codegen expressions after a degree join — they scale to any
edge count with exactly one shuffle (the degree groupBy) plus broadcast joins
of the degree table when it fits, or shuffle-hash joins otherwise.

Reference parity:
- DBH (degree-based hashing):  w = (deg_u <= deg_v ? u : v); bucket = w % p
  /root/reference/src/dbh_partitioner.cpp:80-83
- PowerLyra hybrid-cut: deg_dst < 100 ? dst % p : src % p
  /root/reference/src/hybrid_partitioner.cpp:93-98 (threshold hpp:23-24)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import degrees

HYBRID_DEGREE_THRESHOLD = 100  # PowerLyra EuroSys'15 default, hybrid_partitioner.hpp:23


def _with_degrees(edges: DataFrame, deg: DataFrame | None) -> DataFrame:
    if deg is None:
        # materialize: the degree aggregation would otherwise be recomputed
        # once per endpoint join (it appears under BOTH broadcast exchanges)
        deg = degrees(edges).localCheckpoint(eager=True)
    deg = F.broadcast(deg)
    return (
        edges.join(deg.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src")
        .join(deg.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst")
    )


def dbh_partition(edges: DataFrame, p: int, deg: DataFrame | None = None) -> DataFrame:
    """Degree-Based Hashing: hash the lower-degree endpoint.

    Returns (src, dst, bucket).  Deterministic; ties (deg equal) go to src,
    matching the reference's ``<=`` (src/dbh_partitioner.cpp:80-83).
    """
    e = _with_degrees(edges, deg)
    w = F.when(F.col("deg_src") <= F.col("deg_dst"), F.col("src")).otherwise(F.col("dst"))
    return e.select("src", "dst", F.pmod(w, F.lit(p)).cast("long").alias("bucket"))


def hybrid_partition(
    edges: DataFrame,
    p: int,
    deg: DataFrame | None = None,
    threshold: int = HYBRID_DEGREE_THRESHOLD,
) -> DataFrame:
    """PowerLyra hybrid-cut: low-degree dst keeps its edges; high-degree dst
    scatters by src (src/hybrid_partitioner.cpp:93-98)."""
    e = _with_degrees(edges, deg)
    w = F.when(F.col("deg_dst") < F.lit(threshold), F.col("dst")).otherwise(F.col("src"))
    return e.select("src", "dst", F.pmod(w, F.lit(p)).cast("long").alias("bucket"))
