"""Butterfly (bipartite 4-cycle) counting — the bipartite analogue of the
triangle family (triangles.py) for the RAW customer--supplier co-occurrence
graph, whose triangle count is structurally zero.

A butterfly is a complete 2x2 biclique {u1, u2} x {w1, w2}: the densest
bipartite motif, the standard cohesion signal for co-engagement graphs
(Sanei-Mehri, Sariyuce & Tirthapura, KDD 2018 — "Butterfly Counting in
Bipartite Networks").  The reference's partition-quality analysis is motif-
blind; this is part of the analytics layer the north rule asks for on top
of the partitioned edge table.

Exact-count recipe (no sampling, all BIGINT):
  1. pick the WEDGE SIDE: wedges through side S cost Sigma_{s in S} C(d_s, 2)
     rows; the other side's pair-counts result.  Choose the side with the
     SMALLER wedge volume (the coarse-grained form of the KDD'18 vertex-priority rule;
     on the sf graphs the customer side wins by ~14x — 0.83M vs 11.8M at
     sf0.01).  Both volumes come from one degree histogram aggregate.
  2. wedge join through the chosen side: pairs (a < b) of other-side
     vertices sharing a wedge-side neighbor, groupBy(a, b) -> c(a,b) with
     map-side combine (the exchange is |pairs|, never |wedges|).
  3. butterflies = Sigma_pairs C(c, 2); per-vertex share b(v) =
     Sigma_{pairs containing v} C(c, 2) (each butterfly counted once per
     non-wedge-side endpoint it contains).

All arithmetic is integer (counts and C(n,2) on BIGINTs), so the DuckDB
oracle replay is hash-exact.

Scale: wedge volume on the cheaper side is the same Sigma deg^2 the oriented
triangle join bounds; for graphs where BOTH sides are hub-heavy pass
``max_center_degree`` to drop wedge-side hubs from enumeration (documented
undercount, same contract as linkpred.py's cap).  The groupBy(a, b) exchange
is pair-distinct and partial-aggregated — the shuffle carries one row per
co-neighbor pair, not per wedge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _wedge_volumes(edges: DataFrame) -> tuple[int, int]:
    """(vol_src_side, vol_dst_side): Sigma C(deg, 2) per side, one agg."""
    both = edges.select(F.lit("s").alias("side"), F.col("src").alias("v")).unionAll(
        edges.select(F.lit("d").alias("side"), F.col("dst").alias("v"))
    )
    rows = (
        both.groupBy("side", "v")
        .agg(F.count(F.lit(1)).alias("d"))
        .groupBy("side")
        .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).cast("long").alias("w"))
        .collect()
    )
    vol = {r["side"]: int(r["w"] or 0) for r in rows}
    return vol.get("s", 0), vol.get("d", 0)


def _pair_counts(
    edges: DataFrame, wedge_side: str, max_center_degree: int | None
) -> DataFrame:
    """(a, b, c): co-neighbor pair counts of the NON-wedge side, a < b."""
    other = "dst" if wedge_side == "src" else "src"
    e = edges.select(F.col(wedge_side).alias("s"), F.col(other).alias("u"))
    if max_center_degree is not None:
        keep = (
            e.groupBy("s")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_center_degree)
            .select("s")
        )
        e = e.join(keep, "s")
    l = e.select(F.col("s"), F.col("u").alias("a"))
    r = e.select(F.col("s"), F.col("u").alias("b"))
    return (
        l.join(r, "s")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def butterfly_count(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """One row (n_butterflies, n_copair_rows, n_wedges, wedge_side) —
    exact butterfly count of the bipartite (src, dst) edge table."""
    vol_src, vol_dst = _wedge_volumes(edges)
    wedge_side = "src" if vol_src <= vol_dst else "dst"
    pairs = _pair_counts(edges, wedge_side, max_center_degree)
    return pairs.agg(
        F.sum(F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("n_butterflies"),
        F.count(F.lit(1)).alias("n_copair_rows"),
        F.lit(min(vol_src, vol_dst)).cast("long").alias("n_wedges"),
        F.lit(wedge_side).alias("wedge_side"),
    )


def butterflies_per_vertex(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """(vertex, n_butterflies) for every NON-wedge-side vertex with >= 1
    butterfly: b(v) = Sigma over co-neighbor pairs containing v of C(c, 2).
    Each butterfly {u1,u2}x{w1,w2} counts once for u1 and once for u2 (its
    non-wedge-side endpoints) — the per-vertex participation used for
    butterfly-core ("tip") decompositions."""
    vol_src, vol_dst = _wedge_volumes(edges)
    wedge_side = "src" if vol_src <= vol_dst else "dst"
    pairs = _pair_counts(edges, wedge_side, max_center_degree)
    contrib = pairs.select(
        F.col("a").alias("vertex"),
        (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("nb"),
    ).unionAll(
        pairs.select(
            F.col("b").alias("vertex"),
            (F.col("c") * (F.col("c") - 1) / 2).cast("long").alias("nb"),
        )
    )
    return (
        contrib.groupBy("vertex")
        .agg(F.sum("nb").alias("n_butterflies"))
        .where(F.col("n_butterflies") > 0)
    )
