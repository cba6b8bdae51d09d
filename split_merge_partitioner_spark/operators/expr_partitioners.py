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

import math

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


def grid_partition(edges: DataFrame, p: int) -> DataFrame:
    """2D grid vertex-cut (GraphBuilder / PowerGraph "grid" ingress): arrange
    the ``p = N*N`` partitions as an N x N matrix and place edge (u, v) in
    cell ``(u mod N, v mod N)``, i.e. bucket = (u mod N)*N + (v mod N).

    The cheapest member of the baseline family the reference benchmarks FSM
    against: NO degree table, NO join, NO shuffle — a single codegen'd
    projection over the edge scan, so it costs exactly one pass at any data
    size.  In exchange it carries a HARD replication bound no hash-by-vertex
    scheme has: vertex v only ever appears in grid row (v mod N) as a source
    and grid column (v mod N) as a destination, so |replicas(v)| <= 2N - 1 =
    2*sqrt(p) - 1 regardless of degree — hubs cannot blow up a partition's
    vertex set.  The price is a worse *average* RF than degree-aware schemes
    on power-law graphs (measured side by side in ``compare_partitioners``).

    ``p`` must be a perfect square; raises ValueError otherwise (the
    rectangular generalization changes the bound and is not implemented).
    """
    n = math.isqrt(p)
    if n * n != p:
        raise ValueError(
            f"grid_partition needs a perfect-square p (got {p}); "
            "use p = N*N or pick dbh/hybrid/random for arbitrary p"
        )
    bucket = F.pmod(F.col("src"), F.lit(n)) * F.lit(n) + F.pmod(F.col("dst"), F.lit(n))
    return edges.select("src", "dst", bucket.cast("long").alias("bucket"))


def random_partition(edges: DataFrame, p: int, seed: int = 42) -> DataFrame:
    """Uniform random edge placement — the literature's control baseline
    (best edge balance, worst replication: E[RF] -> p*(1-(1-1/p)^deg) on
    hubs).  bucket = lehmer_hash(src*1000003 + dst, seed) mod p via
    ``functions.sampling.sample_hash`` — a pure function of the edge, so the
    assignment is deterministic, ANSI-safe (no wraparound semantics), stable
    under repartitioning/retries/scale-out, and bit-replayable in the DuckDB
    oracle.  Zero joins, zero shuffles, one codegen'd projection."""
    from ..functions.sampling import sample_hash

    key = F.col("src").cast("long") * F.lit(1000003) + F.col("dst").cast("long")
    return edges.select(
        "src", "dst", F.pmod(sample_hash(key, seed), F.lit(p)).cast("long").alias("bucket")
    )
