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


def rich_club(edges: DataFrame) -> DataFrame:
    """(k, n_k, e_k, phi_ppm) for every distinct degree value k: the
    rich-club profile phi(k) = 2*E_k / (N_k*(N_k-1)) over the subgraph on
    vertices of degree > k (Colizza et al. 2006) — "do the hubs of the
    link graph talk to each other".

    Single-pass shape (NOT per-k subgraph recomputation): an edge belongs
    to E_k exactly when min(deg_src, deg_dst) > k, so E_k is a suffix sum
    of the edge min-endpoint-degree histogram, and N_k a suffix sum of
    the degree histogram — two histogram aggs + one ordered window over
    the (tiny, #distinct-degrees-sized) threshold relation.  phi is
    emitted as exact fixed-point ppm ((2*E_k*10^6) DIV (N_k*(N_k-1)) —
    the bigram_coherence rounding rule: no cross-engine ROUND half-way
    exposure); rows with N_k < 2 are dropped (phi undefined)."""
    und = edges.select(F.col("src").alias("v")).unionAll(
        edges.select(F.col("dst").alias("v"))
    )
    deg = und.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    dh = deg.groupBy("d").agg(F.count(F.lit(1)).alias("nv"))
    emin = (
        edges.join(deg.select(F.col("v").alias("src"), F.col("d").alias("ds")), "src")
        .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("dd")), "dst")
        .select(F.least("ds", "dd").alias("md"))
        .groupBy("md")
        .agg(F.count(F.lit(1)).alias("ne"))
    )
    from pyspark.sql import Window

    ks = dh.select(F.col("d").alias("k"))
    joined = (
        ks.join(dh.withColumnRenamed("d", "k"), "k", "left")
        .join(emin.withColumnRenamed("md", "k"), "k", "left")
        .select(
            "k",
            F.coalesce("nv", F.lit(0)).alias("nv"),
            F.coalesce("ne", F.lit(0)).alias("ne"),
        )
    )
    w = Window.orderBy(F.col("k").asc()).rowsBetween(1, Window.unboundedFollowing)
    prof = joined.select(
        "k",
        F.coalesce(F.sum("nv").over(w), F.lit(0)).cast("long").alias("n_k"),
        F.coalesce(F.sum("ne").over(w), F.lit(0)).cast("long").alias("e_k"),
    ).where(F.col("n_k") >= 2)
    return prof.select(
        "k",
        "n_k",
        "e_k",
        F.expr("(2 * e_k * 1000000L) div (n_k * (n_k - 1))").alias("phi_ppm"),
    )


def directed_summary(edges: DataFrame) -> DataFrame:
    """One row (m, n_self_loops, n_reciprocal, reciprocity_ppm) for a
    DIRECTED (src, dst) table (src -> dst as given, deduped here):
    n_reciprocal counts ordered edges (u, v), u != v, whose mirror (v, u)
    is also present (so mutual pairs contribute 2), reciprocity =
    n_reciprocal / (m - n_self_loops) in exact ppm (the fixed-point rule).
    One dedup exchange + one self-join on the flipped key — the classic
    one-pass reciprocity measurement (Newman 2003 directed-network
    vocabulary)."""
    e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
    proper = e.where(F.col("src") != F.col("dst"))
    flipped = proper.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = proper.join(flipped, ["src", "dst"]).count()
    agg = e.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum((F.col("src") == F.col("dst")).cast("long")).alias("n_self_loops"),
    )
    return agg.select(
        "m",
        "n_self_loops",
        F.lit(recip).cast("long").alias("n_reciprocal"),
        F.expr(
            f"CASE WHEN m - n_self_loops > 0 THEN ({recip}L * 1000000L) div (m - n_self_loops) ELSE 0L END"
        ).alias("reciprocity_ppm"),
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """(degree, n_vertices, knn_ppm): the degree-binned average neighbor
    degree curve knn(k) — the workhorse assortativity PROFILE (Pastor-
    Satorras et al. 2001): decreasing knn(k) = hubs attach to leaves
    (disassortative), the single assortativity scalar's shape-level
    companion.  knn_ppm per bin = (Sigma over vertices of that degree of
    Sigma neighbor degrees * 10^6) DIV (k * n_vertices) — exact integer
    end-to-end.  One degree join onto the doubled edges + two
    partial-aggregated groupBys; output is #distinct-degrees rows."""
    und = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).unionAll(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    deg = und.groupBy(F.col("v").alias("x")).agg(F.count(F.lit(1)).alias("d"))
    paired = (
        und.join(deg.select(F.col("x").alias("v"), F.col("d").alias("dv")), "v")
        .join(deg.select(F.col("x").alias("w"), F.col("d").alias("dw")), "w")
    )
    per_v = paired.groupBy("v", "dv").agg(F.sum("dw").alias("snd"))
    return (
        per_v.groupBy(F.col("dv").alias("degree"))
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum("snd").alias("__snd__"),
        )
        .select(
            "degree",
            "n_vertices",
            F.expr("(__snd__ * 1000000L) div (degree * n_vertices)").alias("knn_ppm"),
        )
    )


def degree_gini(edges: DataFrame) -> DataFrame:
    """One row (n_vertices, m2_sum_degrees, gini_ppm): the Gini coefficient
    of the degree distribution in exact parts-per-million — the standard
    single-number inequality/concentration profile of a link graph (0 =
    regular, ->1 = one hub owns every edge).

    Closed form on sorted degrees d_1 <= ... <= d_n:
        G = (2*Σ i·d_i − (n+1)·Σ d_i) / (n·Σ d_i)
    Σ i·d_i is tie-invariant, so it is computed WITHOUT a global sort: group
    by degree VALUE (c_k vertices of degree d_k, C_k = vertices of smaller
    degree), then Σ i·d_i = Σ_k d_k·(c_k·C_k + c_k·(c_k+1)/2) — one groupBy
    over n rows plus a window over the DISTINCT degree values (a few
    hundred rows on any real graph).  No single-partition window over
    vertices, no global sort — the scale trap a naive rank-based Gini hits
    at 10^9 vertices.  All BIGINT; the final ratio is a ppm floor-div.
    """
    from ..sources.edges import degrees

    by_deg = degrees(edges).groupBy("degree").agg(F.count(F.lit(1)).alias("c"))
    from pyspark.sql import Window

    w = Window.orderBy("degree").rowsBetween(Window.unboundedPreceding, -1)
    terms = by_deg.select(
        "degree",
        "c",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("cum_before"),
    )
    return terms.agg(
        F.sum("c").cast("long").alias("n_vertices"),
        F.sum(F.col("degree") * F.col("c")).cast("long").alias("m2_sum_degrees"),
        F.expr(
            "CAST((2 * sum(degree * (c * cum_before + (c * (c + 1)) div 2)) "
            "- (sum(c) + 1) * sum(degree * c)) * 1000000 "
            "div (sum(c) * sum(degree * c)) AS BIGINT)"
        ).alias("gini_ppm"),
    )


def attribute_assortativity(
    edges: DataFrame, labels: DataFrame, label_col: str = "label"
) -> DataFrame:
    """One row (assortativity_ppm, n_pairs, same_label_pairs): Newman's
    categorical assortativity coefficient (Newman 2003, "Mixing patterns
    in networks" eq. 2) of a vertex attribute over an undirected edge
    relation — the homophily scalar (+1e6 = perfect same-label mixing,
    0 = random, negative = disassortative).

    Exact integer arithmetic: with T = 2m directed endpoint pairs,
    S = same-label directed pairs, and A = sum_i (row_i)^2 over the
    mixing-matrix row marginals, r = (T*S - A) / (T^2 - A); the single
    division is a floor-ppm on DECIMAL(38,0) (T^2 overflows int64 at
    cluster scale — 128-bit on both engines, truncation toward zero
    verified identical).  Plan: two broadcast-joinable label lookups on
    the edge table + two map-side-combined aggregates — no shuffle wider
    than the label-marginal relation.  ``labels`` must cover every
    endpoint (inner joins drop unlabeled edges — documented)."""
    lab = F.broadcast(labels.select(F.col("vertex"), F.col(label_col).alias("lab")))
    dd = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    )
    paired = (
        dd.join(lab.withColumnRenamed("vertex", "a").withColumnRenamed("lab", "la"), "a")
        .join(lab.withColumnRenamed("vertex", "b").withColumnRenamed("lab", "lb"), "b")
    )
    rows = paired.groupBy("la").agg(
        F.count(F.lit(1)).cast("long").alias("row_t"),
        F.sum((F.col("la") == F.col("lb")).cast("long")).cast("long").alias("row_s"),
    )
    return rows.agg(
        F.sum("row_t").alias("t"), F.sum("row_s").alias("s"),
        F.sum(F.col("row_t").cast("decimal(38,0)") * F.col("row_t")).alias("a2"),
    ).select(
        F.expr(
            "CAST((1000000 * (CAST(t AS DECIMAL(38,0)) * s - a2))"
            " div (CAST(t AS DECIMAL(38,0)) * t - a2) AS BIGINT)"
        ).alias("assortativity_ppm"),
        F.expr("CAST(t div 2 AS BIGINT)").alias("n_pairs"),
        F.expr("CAST(s div 2 AS BIGINT)").alias("same_label_pairs"),
    )
