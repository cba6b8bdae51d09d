"""Per-vertex graphlet degree vector (GDV): exact INDUCED orbit counts for
every connected graphlet on <= 4 vertices — the 15 orbits of Přulj's
graphlet signature (Přulj, Bioinformatics 2007; counted the PGD way, Ahmed
et al. ICDM 2015), the standard structural-role feature vector for graph
ML (role discovery, network alignment, GNN positional features).

Method — the per-vertex extension of `graphlets.py::graphlet_census4`:
count cheap NON-INDUCED per-vertex quantities relationally, then apply the
machine-derived inclusion-matrix inversion (block-diagonal by graphlet
size; derived by enumerating marked-pattern embeddings into marked
induced graphlets and inverting the unit-diagonal integer system —
verified in tests against brute-force 4-subset enumeration):

    o_p3_end   = n_p3_end − 2·n_tri                       (3-vertex block)
    o_p3_center= n_p3_center − n_tri
    o_p4_end   = n_p4_end − 2·n_c4 − 2·n_paw_tail − n_paw_tri
                 + 4·n_dia_side + 2·n_dia_hub − 6·n_k4    (4-vertex block)
    o_p4_mid   = n_p4_mid − 2·n_c4 − 2·n_paw_attach − n_paw_tri
                 + 2·n_dia_side + 4·n_dia_hub − 6·n_k4
    o_claw_leaf= n_claw_leaf − n_paw_tail − n_paw_tri
                 + 2·n_dia_side + n_dia_hub − 3·n_k4
    o_claw_ctr = n_claw_center − n_paw_attach + n_dia_hub − n_k4
    o_c4       = n_c4 − n_dia_side − n_dia_hub + 3·n_k4
    o_paw_tail = n_paw_tail − 2·n_dia_side + 3·n_k4
    o_paw_att  = n_paw_attach − 2·n_dia_hub + 3·n_k4
    o_paw_tri  = n_paw_tri − 2·n_dia_side − 2·n_dia_hub + 6·n_k4
    o_dia_side = n_dia_side − 3·n_k4;  o_dia_hub = n_dia_hub − 3·n_k4

with the non-induced quantities (d = deg(v), S1 = Σ_{u∈N(v)} d(u),
s(v,u) = per-edge common-neighbor count, cd(v,w) = codegree of ANY pair
with a common neighbor, t(v) = triangles at v):

    n_p3_end = S1 − d            n_p3_center = C(d,2)
    n_p4_end = Σ_w cd(v,w)(d(w)−1) − 2t      n_p4_mid = (d−1)(S1−d) − 2t
    n_claw_leaf = Σ_u C(d(u)−1, 2)           n_claw_center = C(d,3)
    n_c4 = Σ_w C(cd(v,w), 2)
    n_paw_tail = Σ_u (t(u) − s(v,u))         n_paw_attach = t·(d−2)
    n_paw_tri  = Σ_u s(v,u)(d(u)−2)          n_dia_hub = Σ_u C(s(v,u), 2)
    n_dia_side = Σ_{triangles (v,a,b)} (s(a,b) − 1)
    n_k4 = ordered 4-clique enumeration credited to its 4 corners

Scale shape: three super-linear legs, all already-tuned kernel shapes —
the degree-oriented wedge join (per-edge support + triangle/4-clique
enumeration: shuffle rows ∝ #triangles/#K4s, hub fan-out capped at
O(√m)), and the codegree pair exchange (shuffle rows = one per
co-neighbor PAIR, map-side combined; wedge volume Σ C(d,2) is the honest
cost, exactly square_count's — hub-heavy graphs can cap it there, here we
stay exact).  Everything else is degree algebra over n-row relations
joined once on vertex.  No 4-subset is ever enumerated, no Python touches
a row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import canonicalize_edges
from ..storage import release
from .triangles import _oriented, edge_support


def orbit_counts(edges: DataFrame) -> DataFrame:
    """(vertex, deg, p3_end, p3_center, tri, p4_end, p4_mid, claw_leaf,
    claw_center, c4, paw_tail, paw_attach, paw_tri, diamond_side,
    diamond_hub, k4) — exact induced orbit counts (all BIGINT) for every
    vertex of the canonical simple undirected graph."""
    e = canonicalize_edges(edges).localCheckpoint(eager=True)
    scratch = [e]
    try:
        und = e.select(F.col("src").alias("v"), F.col("dst").alias("nb")).unionAll(
            e.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
        )
        deg = (
            und.groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
            .localCheckpoint(eager=True)
        )
        scratch.append(deg)
        # per-edge support, densified with the 0 rows edge_support omits
        sup = edge_support(e)
        supf = (
            e.join(sup, ["src", "dst"], "left")
            .select("src", "dst", F.coalesce("support", F.lit(0)).cast("long").alias("s"))
            .localCheckpoint(eager=True)
        )
        scratch.append(sup)
        scratch.append(supf)
        sdir = supf.select(F.col("src").alias("v"), F.col("dst").alias("u"), "s").unionAll(
            supf.select(F.col("dst").alias("v"), F.col("src").alias("u"), "s")
        )
        tri = (
            sdir.groupBy("v")
            .agg((F.sum("s") / 2).cast("long").alias("t"))
            .localCheckpoint(eager=True)
        )
        scratch.append(tri)
        # edge-neighbor aggregates: everything that is Σ over u ∈ N(v) of
        # (d(u), s(v,u), t(u)) algebra — ONE join pass over the directed
        # edge relation
        nbr = (
            sdir.join(deg.select(F.col("v").alias("u"), F.col("d").alias("du")), "u")
            .join(
                tri.select(F.col("v").alias("u"), F.col("t").alias("tu")),
                "u",
                "left",
            )
            .select("v", "u", "s", "du", F.coalesce("tu", F.lit(0)).alias("tu"))
            .groupBy("v")
            .agg(
                F.sum("du").cast("long").alias("s1"),
                F.sum(F.expr("(du - 1) * (du - 2) div 2")).cast("long").alias("clawl"),
                F.sum(F.col("tu") - F.col("s")).cast("long").alias("pawtail"),
                F.sum(F.col("s") * (F.col("du") - 2)).cast("long").alias("pawtri"),
                F.sum(F.expr("(s * (s - 1)) div 2")).cast("long").alias("diahub"),
            )
        )
        # codegree relation over co-neighbor pairs (a < b): the square_count
        # wedge exchange, kept as a pair relation
        w1 = und.select(F.col("v").alias("c"), F.col("nb").alias("a"))
        w2 = und.select(F.col("v").alias("c"), F.col("nb").alias("b"))
        cd = (
            w1.join(w2, "c")
            .where(F.col("a") < F.col("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("c"))
            .localCheckpoint(eager=True)
        )
        scratch.append(cd)
        cdir = cd.select(F.col("a").alias("v"), F.col("b").alias("w"), "c").unionAll(
            cd.select(F.col("b").alias("v"), F.col("a").alias("w"), "c")
        )
        cdagg = (
            cdir.join(deg.select(F.col("v").alias("w"), F.col("d").alias("dw")), "w")
            .groupBy("v")
            .agg(
                F.sum(F.col("c") * (F.col("dw") - 1)).cast("long").alias("p4raw"),
                F.sum(F.expr("(c * (c - 1)) div 2")).cast("long").alias("c4"),
            )
        )
        # triangle enumeration on the degree orientation, opposite-edge
        # support joined per corner (canonical keys via least/greatest)
        o = _oriented(e, "degree")
        scratch.append(o)
        ab = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        bc = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        ac = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        tris = ab.join(bc, "b").join(ac, ["a", "c"]).localCheckpoint(eager=True)
        scratch.append(tris)

        def _opp(corner, x, y):
            k1 = F.least(F.col(x), F.col(y))
            k2 = F.greatest(F.col(x), F.col(y))
            return tris.select(
                F.col(corner).alias("v"), k1.alias("src"), k2.alias("dst")
            )

        dia_side = (
            _opp("a", "b", "c")
            .unionAll(_opp("b", "a", "c"))
            .unionAll(_opp("c", "a", "b"))
            .join(supf, ["src", "dst"])
            .groupBy("v")
            .agg(F.sum(F.col("s") - 1).cast("long").alias("diaside"))
        )
        # ordered 4-clique enumeration (kclique_count's k=4 path, corners
        # kept): extend each oriented triangle by c's out-neighbors, check
        # the two remaining edges on the same oriented relation
        ext = (
            tris.join(o.select(F.col("src").alias("c"), F.col("dst").alias("x")), "c")
            .join(
                o.select(F.col("src").alias("a"), F.col("dst").alias("x")),
                ["a", "x"],
            )
            .join(
                o.select(F.col("src").alias("b"), F.col("dst").alias("x")),
                ["b", "x"],
            )
        )
        k4v = (
            ext.select(F.col("a").alias("v"))
            .unionAll(ext.select(F.col("b")))
            .unionAll(ext.select(F.col("c")))
            .unionAll(ext.select(F.col("x")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("k4"))
            .localCheckpoint(eager=True)
        )
        scratch.append(k4v)

        z = lambda c: F.coalesce(F.col(c), F.lit(0)).cast("long")
        j = (
            deg.join(tri, "v", "left")
            .join(nbr, "v", "left")
            .join(cdagg, "v", "left")
            .join(dia_side, "v", "left")
            .join(k4v, "v", "left")
            .select(
                "v",
                F.col("d"),
                z("t").alias("t"),
                z("s1").alias("s1"),
                z("clawl").alias("clawl"),
                z("pawtail").alias("n_pawtail"),
                z("pawtri").alias("n_pawtri"),
                z("diahub").alias("n_diahub"),
                z("p4raw").alias("p4raw"),
                z("c4").alias("n_c4"),
                z("diaside").alias("n_diaside"),
                z("k4").alias("n_k4"),
            )
            .withColumn("n_p4end", F.col("p4raw") - 2 * F.col("t"))
            .withColumn(
                "n_p4mid",
                (F.col("d") - 1) * (F.col("s1") - F.col("d")) - 2 * F.col("t"),
            )
            .withColumn("n_pawatt", F.col("t") * (F.col("d") - 2))
        )
        out = j.select(
            F.col("v").alias("vertex"),
            F.col("d").alias("deg"),
            (F.col("s1") - F.col("d") - 2 * F.col("t")).alias("p3_end"),
            (F.expr("(d * (d - 1)) div 2") - F.col("t")).alias("p3_center"),
            F.col("t").alias("tri"),
            (
                F.col("n_p4end") - 2 * F.col("n_c4") - 2 * F.col("n_pawtail")
                - F.col("n_pawtri") + 4 * F.col("n_diaside")
                + 2 * F.col("n_diahub") - 6 * F.col("n_k4")
            ).alias("p4_end"),
            (
                F.col("n_p4mid") - 2 * F.col("n_c4") - 2 * F.col("n_pawatt")
                - F.col("n_pawtri") + 2 * F.col("n_diaside")
                + 4 * F.col("n_diahub") - 6 * F.col("n_k4")
            ).alias("p4_mid"),
            (
                F.col("clawl") - F.col("n_pawtail") - F.col("n_pawtri")
                + 2 * F.col("n_diaside") + F.col("n_diahub") - 3 * F.col("n_k4")
            ).alias("claw_leaf"),
            (
                F.expr("(d * (d - 1) * (d - 2)) div 6") - F.col("n_pawatt")
                + F.col("n_diahub") - F.col("n_k4")
            ).alias("claw_center"),
            (
                F.col("n_c4") - F.col("n_diaside") - F.col("n_diahub")
                + 3 * F.col("n_k4")
            ).alias("c4"),
            (F.col("n_pawtail") - 2 * F.col("n_diaside") + 3 * F.col("n_k4")).alias(
                "paw_tail"
            ),
            (F.col("n_pawatt") - 2 * F.col("n_diahub") + 3 * F.col("n_k4")).alias(
                "paw_attach"
            ),
            (
                F.col("n_pawtri") - 2 * F.col("n_diaside") - 2 * F.col("n_diahub")
                + 6 * F.col("n_k4")
            ).alias("paw_tri"),
            (F.col("n_diaside") - 3 * F.col("n_k4")).alias("diamond_side"),
            (F.col("n_diahub") - 3 * F.col("n_k4")).alias("diamond_hub"),
            F.col("n_k4").alias("k4"),
        ).localCheckpoint(eager=True)
        return out
    finally:
        for df in scratch:
            release(df)
