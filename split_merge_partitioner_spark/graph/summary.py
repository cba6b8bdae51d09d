"""Whole-graph summary metrics: degree assortativity and global clustering.

The one-row scalar dashboards a link-graph deployment tracks per snapshot
(Newman 2002 assortativity; transitivity = 3·triangles / wedges).  Both are
computed from exact BIGINT sums (degrees and counts are integers) with ONE
final float division rounded at the end, so the DuckDB oracle matches
hash-for-hash — no float-reduction-order exposure.

Plans: assortativity = two broadcast degree joins onto the edge table + one
global agg (map-side combined, scalars only); clustering reuses the
oriented triangle count (triangles.py) + one degree agg.  Nothing here
shuffles more than a degree table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One row (assortativity, m_edges): Pearson correlation of endpoint
    degrees over the doubled edge list (each undirected edge counted in
    both directions — the standard symmetric estimator).  Exact integer
    moments; the correlation is the only float op (rounded to 6)."""
    und = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).unionAll(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    deg = und.groupBy(F.col("v").alias("x")).agg(F.count(F.lit(1)).alias("d"))
    paired = (
        und.join(F.broadcast(deg.select(F.col("x").alias("v"), F.col("d").alias("dv"))), "v")
        .join(F.broadcast(deg.select(F.col("x").alias("w"), F.col("d").alias("dw"))), "w")
    )
    mom = paired.agg(
        F.count(F.lit(1)).alias("n2"),
        F.sum("dv").alias("sx"),
        F.sum(F.col("dv") * F.col("dv")).alias("sxx"),
        F.sum(F.col("dv") * F.col("dw")).alias("sxy"),
    )
    # symmetric pairing: Σdw = Σdv and Σdw² = Σdv², so one endpoint's
    # moments suffice; r = (n·Σxy − (Σx)²) / (n·Σx² − (Σx)²)
    return mom.select(
        F.round(
            F.try_divide(
                F.col("n2") * F.col("sxy") - F.col("sx") * F.col("sx"),
                F.col("n2") * F.col("sxx") - F.col("sx") * F.col("sx"),
            ),
            6,
        ).alias("assortativity"),
        F.try_divide(F.col("n2"), F.lit(2)).cast("long").alias("m_edges"),
    )


def global_clustering(edges: DataFrame) -> DataFrame:
    """One row (global_clustering, n_triangles, n_wedges): transitivity =
    3·triangles / wedges, wedges = Σ_v deg(v)·(deg(v)−1)/2.  Triangle count
    comes from the degree-oriented join (triangles.py); all counts BIGINT."""
    from .triangles import triangle_count

    tri = triangle_count(edges)
    und = edges.select(F.col("src").alias("v")).unionAll(
        edges.select(F.col("dst").alias("v"))
    )
    wed = (
        und.groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("n_wedges"))
    )
    return wed.select(
        F.round(3.0 * F.lit(tri) / F.greatest(F.col("n_wedges"), F.lit(1)), 6).alias(
            "global_clustering"
        ),
        F.lit(tri).cast("long").alias("n_triangles"),
        "n_wedges",
    )
