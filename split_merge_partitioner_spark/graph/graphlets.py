"""Exact INDUCED 4-vertex graphlet census (K4, diamond, C4, tailed
triangle, claw, P4) by closed-form motif algebra — the PGD approach (Ahmed,
Neville, Rossi & Duffield, "Efficient Graphlet Counting for Large
Networks", ICDM 2015): count the cheap NON-induced quantities from degrees
and triangle structure, then invert the (lower-triangular, unit-diagonal)
motif inclusion matrix.  Nothing enumerates 4-sets.

Non-induced building blocks (each exact BIGINT):

    N_k4      = ordered 4-clique enumeration            (triangles.py)
    N_diamond = Σ_e C(sup_e, 2)             sup_e = per-edge triangles
    N_c4      = codegree identity                        (triangles.py)
    N_tailed  = Σ_v t_v · (d_v − 2)          t_v = per-vertex triangles
    N_claw    = Σ_v C(d_v, 3)
    N_path4   = Σ_{(u,v)∈E} (d_u−1)(d_v−1) − 3·T

Inversion (machine-derived from the inclusion matrix — each row is the
copy count of the row motif inside each column graphlet; verified
programmatically and against brute-force 4-subset enumeration in tests):

    I_k4      = N_k4
    I_diamond = N_diamond − 6·N_k4
    I_c4      = N_c4 − N_diamond + 3·N_k4
    I_tailed  = N_tailed − 4·N_diamond + 12·N_k4
    I_claw    = N_claw − N_tailed + 2·N_diamond − 4·N_k4
    I_path4   = N_path4 − 2·N_tailed − 4·N_c4 + 6·N_diamond − 12·N_k4

Scale shape: the expensive legs are exactly the already-tuned primitives —
the degree-oriented wedge join (triangles / per-edge support, shuffle rows
= 3·#triangles), the codegree pair exchange (squares), and the ordered
clique extension (k4).  Everything added here is degree algebra: two
broadcast-sized joins of triangle-sparse relations against the degree
table and six scalar aggregates crossJoined into one row — no new
per-wedge work, no driver loops (kclique_count's internal scalar is the
one constant-size action, as in its own query).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def graphlet_census4(edges: DataFrame) -> DataFrame:
    """One row with the six INDUCED connected 4-vertex graphlet counts
    (k4, diamond, c4, tailed_triangle, claw, path4) plus n_edges and
    n_triangles, for the canonical undirected simple edge table."""
    from .triangles import (
        edge_support,
        kclique_count,
        square_count,
        triangle_count,
        triangles_per_vertex,
    )

    e = edges.select("src", "dst")
    und = e.select(F.col("src").alias("v")).unionAll(e.select(F.col("dst").alias("v")))
    deg = und.groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("d"))

    n_k4 = int(kclique_count(e, k=4))
    n_tri_scalar = int(triangle_count(e))  # orientation-invariant scalar
    m_sq = square_count(e)  # (n_squares) — non-induced C4

    sup = edge_support(e)  # (src, dst, support), triangle-sparse
    diamond = sup.agg(
        F.coalesce(
            F.expr("sum((support * (support - 1)) div 2)").cast("long"), F.lit(0)
        ).alias("nd")
    )
    tv = triangles_per_vertex(e)  # (vertex, n_triangles), triangle-sparse
    tailed = tv.join(deg.withColumnRenamed("v", "vertex"), "vertex").agg(
        F.coalesce(F.expr("sum(triangles * (d - 2))").cast("long"), F.lit(0)).alias(
            "nt"
        )
    )
    claw = deg.agg(
        F.coalesce(
            F.expr("sum((d * (d - 1) * (d - 2)) div 6)").cast("long"), F.lit(0)
        ).alias("ncl")
    )
    p4raw = (
        e.join(deg.select(F.col("v").alias("src"), F.col("d").alias("du")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("dv")), "dst")
        .agg(
            F.coalesce(F.expr("sum((du - 1) * (dv - 1))").cast("long"), F.lit(0)).alias(
                "np4raw"
            )
        )
    )
    me = e.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))

    row = (
        me.crossJoin(m_sq)
        .crossJoin(diamond)
        .crossJoin(tailed)
        .crossJoin(claw)
        .crossJoin(p4raw)
        .withColumn("nk4", F.lit(n_k4).cast("long"))
        .withColumn("n_triangles", F.lit(n_tri_scalar).cast("long"))
    )
    n_tri = F.col("n_triangles")
    return row.select(
        "n_edges",
        "n_triangles",
        F.col("nk4").alias("k4"),
        (F.col("nd") - 6 * F.col("nk4")).cast("long").alias("diamond"),
        (F.col("n_squares") - F.col("nd") + 3 * F.col("nk4")).cast("long").alias("c4"),
        (F.col("nt") - 4 * F.col("nd") + 12 * F.col("nk4"))
        .cast("long")
        .alias("tailed_triangle"),
        (F.col("ncl") - F.col("nt") + 2 * F.col("nd") - 4 * F.col("nk4"))
        .cast("long")
        .alias("claw"),
        (
            F.col("np4raw")
            - 3 * n_tri
            - 2 * F.col("nt")
            - 4 * F.col("n_squares")
            + 6 * F.col("nd")
            - 12 * F.col("nk4")
        )
        .cast("long")
        .alias("path4"),
    )
