"""Clique-percolation communities (CPM) at k=3 — overlapping communities.

Palla et al., "Uncovering the overlapping community structure of complex
networks in nature and society" (Nature 435, 2005): a k-clique community is
a maximal union of k-cliques reachable through (k-1)-clique overlaps.  At
k=3 that reads: two triangles are adjacent iff they SHARE AN EDGE, and a
community is a connected component of that triangle-adjacency relation.
Unlike Louvain/Spinner/SCAN (one label per vertex), CPM memberships overlap
— a vertex sitting on two edge-disjoint triangle groups belongs to both,
which is exactly the mirror-pod / multi-community structure the
non-overlapping operators flatten away.

Spark-first plan (zero Python on the hot path):
  1. canonical triangles via the degree-oriented wedge join — the same
     O(sqrt(m))-out-degree skew-killer as `triangles.py` (the count kernel's
     plan, widened to emit the triple);
  2. percolation runs on the TRIANGLE-EDGE graph, not the triangle graph:
     node = an edge that lies in >= 1 triangle, encoded u * 2^32 + v (one
     BIGINT — no struct shuffle keys); each triangle (a<b<c) contributes the
     two links (e_ab, e_bc), (e_ab, e_ac), which chain all three of its
     edges into one component.  Two triangles sharing an edge then share a
     NODE, so triangle-adjacency connectivity == edge-node connectivity.
     |nodes| <= 3T, |links| = 2T for T triangles — strictly smaller than
     materializing the pairwise triangle-overlap join, which explodes on
     heavily-supported edges (an edge in s triangles would emit s^2 pairs;
     here it stays ONE node regardless of s: the skew never materializes);
  3. components via star contraction (`connected_components_stars`,
     O(log^2 n) rounds, pure Catalyst) — labels are component-minimum
     edge-nodes, so the whole pipeline is replayable in ANSI SQL
     (wedge join + recursive min-reachability), no floats anywhere;
  4. memberships = decode both endpoints of every labeled edge-node.

Reference parity note: the C++ reference has no community operator; this
extends the analytics layer (reference scope: partitioning + stats,
src/main.cpp) along the same exact-integer oracle discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components_stars
from .triangles import _oriented
from ..storage import release

_ENC = 1 << 32  # edge-node encoding base: node(u<v) = u * 2^32 + v


def triangle_percolation(
    edges: DataFrame, orient: str = "degree", max_rounds: int = 50
) -> tuple[DataFrame, dict]:
    """((vertex, community) overlapping memberships, info) — k=3 clique
    percolation over the canonical undirected edge table.

    ``community`` is the minimum encoded edge-node (u*2^32+v) of the
    component, deterministic and engine-independent.  Vertices on no
    triangle appear in no community (CPM leaves them unclassified, by
    definition).  ``info`` carries the star-contraction round count and the
    triangle-edge link count (<= 2T for T triangles).
    """
    bound = edges.agg(
        F.greatest(F.max("src"), F.max("dst")).alias("mx"),
        F.least(F.min("src"), F.min("dst")).alias("mn"),
    ).collect()[0]
    if bound["mx"] is not None and (bound["mx"] >= (1 << 31) or bound["mn"] < 0):
        raise ValueError(
            "triangle_percolation encodes an edge as src*2^32+dst in one "
            "BIGINT, which needs vertex ids in [0, 2^31); renumber first "
            "(sources/edges.py dense-id idiom) for wider id spaces."
        )
    e = _oriented(edges, orient)
    try:
        ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        tri = ab.join(bc, "b").join(ac, ["a", "c"])
        # canonical sorted triple (degree orientation emits each triangle
        # once, but in degree order — re-sort so the encoding is canonical)
        arr = F.array_sort(F.array("a", "b", "c"))
        tri = tri.select(
            arr.getItem(0).alias("x"), arr.getItem(1).alias("y"), arr.getItem(2).alias("z")
        )
        exy = (F.col("x") * _ENC + F.col("y")).alias("p")
        eyz = (F.col("y") * _ENC + F.col("z")).alias("q")
        exz = (F.col("x") * _ENC + F.col("z")).alias("q")
        links = (
            tri.select(exy, eyz)
            .unionAll(tri.select(exy, exz))
            .select(F.least("p", "q").alias("src"), F.greatest("p", "q").alias("dst"))
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=True)  # cuts the 3-leg wedge plan off the CC rounds
        )
    finally:
        release(e)
    try:
        n_links = links.count()  # <= 2T for T triangles (dedup collapses shared chains)
        comps, info = connected_components_stars(links, max_rounds=max_rounds)
        mem = (
            comps.select(
                # integer div, not `/`: float division loses bits above 2^53
                # and edge-nodes reach 2^63
                F.expr(f"CAST(vertex DIV {_ENC} AS BIGINT)").alias("vertex"),
                F.col("component").alias("community"),
            )
            .unionAll(
                comps.select(
                    (F.col("vertex") % _ENC).cast("long").alias("vertex"),
                    F.col("component").alias("community"),
                )
            )
            .dropDuplicates(["vertex", "community"])
            .localCheckpoint(eager=True)
        )
        info = dict(info)
        info["n_links"] = n_links
    finally:
        release(links)
    return mem, info


def percolation_summary(memberships: DataFrame) -> DataFrame:
    """Per-community size + overlap accounting: (community, n_vertices,
    n_multi) where n_multi counts members that also belong to some OTHER
    community — the overlap CPM exists to expose.  Two map-side-combined
    aggregates + one broadcast-size join (communities << vertices)."""
    per_vertex = memberships.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("n_comms")
    )
    return (
        memberships.join(per_vertex, "vertex")
        .groupBy("community")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.sum(F.when(F.col("n_comms") > 1, 1).otherwise(0)).alias("n_multi"),
        )
    )
