"""Newman modularity of a vertex labeling — exact integer moments.

Q = sum_c [ m_c/m - (d_c/2m)^2 ]  (Newman & Girvan 2004) for an undirected
edge table and a (vertex, label) community assignment: m = |edges|, m_c =
edges with both endpoints in community c, d_c = total degree of c.  The
whole quantity is one rational number,
    Q = (4*m*sum_c m_c - sum_c d_c^2) / (4*m^2),
so numerator and denominator are computed EXACTLY in DECIMAL(38,0) on
Spark / HUGEINT in the DuckDB oracle and the only float arithmetic is one
final rounded division (the summary.py recipe — no reduction-order
exposure, hash-exact cross-engine).  DECIMAL(38,0) headroom: 4*m^2 < 1e38
up to m ~ 5e18 edges, far past the 100-TB regime.

Plan shape: two label joins against the edge table (the m_c count), one
degree join (the d_c sum), all partial-aggregated; no loop, no Python —
Catalyst is free to broadcast the label side when the community table is
small.  This is the quality metric that closes the community-detection
loop: labelprop produces the labels, this scores them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import degrees as degrees_of

_D = "decimal(38,0)"


def modularity(
    edges: DataFrame, labels: DataFrame, weight_col: str | None = None
) -> DataFrame:
    """One row (modularity, n_communities, m_edges) for the undirected
    ``edges`` (src, dst[, weight]) under the ``labels`` (vertex, label)
    assignment.  Every edge endpoint must carry a label (labelings
    produced from the same edge table always do); modularity is rounded
    to 6 decimals.

    ``weight_col`` generalizes every moment to integer edge weights
    (m -> total weight, d_c -> strength) INCLUDING self-loop rows, which
    contribute 2w to their vertex's strength and w to their community's
    internal weight — exactly the convention louvain.py's contraction
    produces, giving the level-invariance property
    Q(contract(G, C), identity) = Q(G, C) (tested).  m_edges reports the
    total WEIGHT under weight_col (the coarse graph's edge multiplicity).
    """
    lab = labels.select("vertex", "label")
    if weight_col is not None:
        w0 = F.col(weight_col).cast("long")
        e = edges.select("src", "dst", w0.alias("w"))
        deg = (
            e.select(F.col("src").alias("vertex"), "w")
            .unionAll(e.select(F.col("dst").alias("vertex"), "w"))
            .groupBy("vertex")
            .agg(F.sum("w").alias("degree"))
        )
        dc = lab.join(deg, "vertex").groupBy("label").agg(F.sum("degree").alias("d_c"))
        ls = lab.select(F.col("vertex").alias("src"), F.col("label").alias("lsrc"))
        ld = lab.select(F.col("vertex").alias("dst"), F.col("label").alias("ldst"))
        mc = (
            e.join(ls, "src")
            .join(ld, "dst")
            .where(F.col("lsrc") == F.col("ldst"))
            .groupBy(F.col("lsrc").alias("label"))
            .agg(F.sum("w").alias("m_c"))
        )
        m_df = e.agg(F.sum("w").cast(_D).alias("m"))
        agg = dc.join(mc, "label", "left").agg(
            F.sum(F.coalesce(F.col("m_c"), F.lit(0)).cast(_D)).alias("sum_mc"),
            F.sum(F.col("d_c").cast(_D) * F.col("d_c").cast(_D)).alias("sum_d2"),
            F.count(F.lit(1)).alias("n_communities"),
        )
        four = F.lit(4).cast(_D)
        return agg.crossJoin(F.broadcast(m_df)).select(
            F.round(
                (four * F.col("m") * F.col("sum_mc") - F.col("sum_d2")).cast("double")
                / (four * F.col("m") * F.col("m")).cast("double"),
                6,
            ).alias("modularity"),
            F.col("n_communities").cast("long").alias("n_communities"),
            F.col("m").cast("long").alias("m_edges"),
        )
    deg = degrees_of(edges)
    dc = (
        lab.join(deg, "vertex")
        .groupBy("label")
        .agg(F.sum("degree").alias("d_c"))
    )
    ls = lab.select(F.col("vertex").alias("src"), F.col("label").alias("lsrc"))
    ld = lab.select(F.col("vertex").alias("dst"), F.col("label").alias("ldst"))
    mc = (
        edges.join(ls, "src")
        .join(ld, "dst")
        .where(F.col("lsrc") == F.col("ldst"))
        .groupBy(F.col("lsrc").alias("label"))
        .agg(F.count(F.lit(1)).alias("m_c"))
    )
    m_df = edges.agg(F.count(F.lit(1)).cast(_D).alias("m"))
    agg = (
        dc.join(mc, "label", "left")
        .agg(
            F.sum(F.coalesce(F.col("m_c"), F.lit(0)).cast(_D)).alias("sum_mc"),
            F.sum(F.col("d_c").cast(_D) * F.col("d_c").cast(_D)).alias("sum_d2"),
            F.count(F.lit(1)).alias("n_communities"),
        )
    )
    four = F.lit(4).cast(_D)
    return agg.crossJoin(F.broadcast(m_df)).select(
        F.round(
            (four * F.col("m") * F.col("sum_mc") - F.col("sum_d2")).cast("double")
            / (four * F.col("m") * F.col("m")).cast("double"),
            6,
        ).alias("modularity"),
        F.col("n_communities").cast("long").alias("n_communities"),
        F.col("m").cast("long").alias("m_edges"),
    )


def conductance(
    edges: DataFrame, labels: DataFrame
) -> DataFrame:
    """(label, vol, cut, conductance_ppm) per community: cut = edges with
    exactly one endpoint inside, vol = summed member degree,
    phi = cut / min(vol, 2m - vol) — the Fiedler-style community-quality
    profile that complements the single modularity scalar (low phi =
    well-separated).  Exact integers + fixed-point ppm (the house
    rounding rule); communities with vol = 0 or vol = 2m are dropped
    (phi undefined).  Plan: two label joins on the edge table + one
    degree join, all partial-aggregated — the modularity() shape with a
    per-label output."""
    lab = labels.select("vertex", "label")
    deg = degrees_of(edges)
    vol = (
        lab.join(deg, "vertex").groupBy("label").agg(F.sum("degree").alias("vol"))
    )
    ls = lab.select(F.col("vertex").alias("src"), F.col("label").alias("lsrc"))
    ld = lab.select(F.col("vertex").alias("dst"), F.col("label").alias("ldst"))
    tagged = edges.join(ls, "src").join(ld, "dst")
    cut = (
        tagged.where(F.col("lsrc") != F.col("ldst"))
        .select(F.explode(F.array("lsrc", "ldst")).alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cut"))
    )
    m2 = edges.count() * 2
    return (
        vol.join(cut, "label", "left")
        .select(
            "label",
            "vol",
            F.coalesce("cut", F.lit(0)).cast("long").alias("cut"),
        )
        .where((F.col("vol") > 0) & (F.col("vol") < m2))
        .select(
            "label",
            "vol",
            "cut",
            F.expr(
                f"(cut * 1000000L) div least(vol, {m2}L - vol)"
            ).alias("conductance_ppm"),
        )
    )
