"""Exact triangle counting.

Canonical oriented edges (src < dst, deduped) make every triangle a<b<c appear
exactly once as the wedge (a,b),(b,c) closed by (a,c) — two self-joins, fully
Catalyst-planned (and SQL-expressible, so the DuckDB oracle covers it).

For skew (hub wedge explosion) at scale: orient by DEGREE instead of id
(lower-degree vertex first) before the wedge join — the standard
wedge-count-minimizing trick; exposed via orient="degree".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import degrees as degrees_of


def _oriented(edges: DataFrame, orient: str) -> DataFrame:
    if orient == "id":
        # already canonical src<dst; materialized for the same 3-leg reuse
        return edges.select("src", "dst").localCheckpoint(eager=True)
    deg = F.broadcast(degrees_of(edges).localCheckpoint(eager=True))
    e = (
        edges.join(deg.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "dd"), "dst")
    )
    first = (F.col("ds") < F.col("dd")) | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
    oriented = e.select(
        F.when(first, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )
    # materialize: the wedge query self-joins this THREE times; without a cut
    # the whole degree-join subplan executes once per leg (seen in
    # explain("formatted") — three repeated BroadcastHashJoin blocks)
    return oriented.localCheckpoint(eager=True)


def triangle_count(edges: DataFrame, orient: str = "degree") -> int:
    """Degree orientation is the default: the wedge count is sum of squared
    OUT-degrees, and orienting low-degree -> high-degree caps out-degree at
    O(sqrt(m)) even on power-law hubs — the skew-killer at scale.  The count
    itself is orientation-invariant (oracle stays on id orientation)."""
    e = _oriented(edges, orient)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    wedges = ab.join(bc, "b")
    return wedges.join(ac, ["a", "c"]).count()


def triangles_per_vertex(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """(vertex, triangles) — each closed triangle credited to all 3 corners
    (corner credits are orientation-invariant: every triangle appears exactly
    once under any acyclic orientation)."""
    e = _oriented(edges, orient)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # rows (a, b, c), a<b<c
    corners = (
        tri.select(F.col("a").alias("vertex"))
        .unionAll(tri.select(F.col("b").alias("vertex")))
        .unionAll(tri.select(F.col("c").alias("vertex")))
    )
    return corners.groupBy("vertex").agg(F.count(F.lit(1)).alias("triangles"))


def local_clustering(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """(vertex, degree, triangles, lcc) — the local clustering coefficient
    lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)), 0 for degree-1 vertices.
    Composition of the per-vertex triangle counts and the degree table
    (left join: triangle-free vertices count 0), rounded to 6 for the
    cross-engine oracle."""
    from ..sources.edges import degrees

    tri = triangles_per_vertex(edges, orient=orient)
    deg = degrees(edges)
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    d = F.col("degree").cast("double")
    lcc = F.when(
        F.col("degree") >= 2, F.round(2.0 * t / (d * (d - 1.0)), 6)
    ).otherwise(F.lit(0.0))
    return deg.join(tri, "vertex", "left").select(
        "vertex", "degree", t.alias("triangles"), lcc.alias("lcc")
    )
