"""Common-neighbor link prediction: top-k suggested new edges per vertex by
shared-neighbor evidence — the "which dependency should this repo add next"
query of a co-change link graph.

Scores per candidate pair (a, b) not already adjacent:
- common        = |N(a) ∩ N(b)|
- jaccard       = common / |N(a) ∪ N(b)|
- adamic_adar   = Σ_{w ∈ N(a)∩N(b)} 1 / ln(deg(w))   (Adamic & Adar 2003)

Execution: wedge generation through each common neighbor w (the same
self-join shape as triangles.py), one groupBy(a, b) with map-side combine,
an anti-join against the edge table, then a per-vertex window.  Candidate
RANKING is integer-only (common desc, candidate asc) so results are exactly
reproducible cross-engine (an FP-ordered rank would tie-break on
last-ulp-sensitive Adamic-Adar sums); the float scores are carried as
rounded output columns.

Scale: wedge volume is Σ_w deg(w)² — power-law hubs dominate it while
contributing the LEAST per-wedge evidence (1/ln(deg) → small), so
``max_center_degree`` drops hub centers from wedge generation (the standard
truncation; scores become slight underestimates for pairs whose only shared
neighbors are hubs — documented semantics).  The DEFAULT is "auto", a
volume-BUDGET rule rather than a fixed degree rule: cap only when the
actual wedge volume Σ_w min(deg(w), c)² would exceed
max(2m·sqrt(2m), 2^26) — the same O(m^1.5) asymptotic bound the oriented
triangle join relies on, with an absolute floor (2^26 ≈ 67M wedge rows is
one task's worth of join work — never worth losing evidence over; the cap
exists to stop the deg(hub)² ~ 10^12 blowups).  Within budget nothing is
capped (small/hub-free graphs keep exact scores); over budget the cap is
the LARGEST distinct degree whose truncated volume fits (floor 16),
computed from the degree histogram on the driver (histogram size is
O(#distinct degrees) — tiny even at 10^12 edges).  Pass an int to choose
the cap, or None to opt in to unbounded wedges.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WEDGE_BUDGET_FLOOR = 1 << 26  # never cap below ~67M wedge rows of join work


def _auto_center_cap(edges: DataFrame, deg: DataFrame) -> int | None:
    """The "auto" volume-budget cap (module docstring): None when the full
    wedge volume Σ deg² fits max(2m·sqrt(2m), 2^26); else the largest
    distinct degree c with Σ min(deg, c)² within budget (floor 16).  All
    arithmetic is integer-valued doubles < 2^53, so the DuckDB oracle replay
    is bit-identical."""
    import numpy as np

    m = edges.count()
    budget = max(2.0 * m * math.sqrt(2.0 * m), float(WEDGE_BUDGET_FLOOR))
    hist = (
        deg.groupBy("degree").agg(F.count(F.lit(1)).alias("nv")).toPandas()
    )
    ds = hist["degree"].to_numpy(np.float64)
    order = np.argsort(ds)
    ds = ds[order]
    nv = hist["nv"].to_numpy(np.float64)[order]
    # f(c_i) = Σ_{d<=c_i} nv·d² + c_i²·Σ_{d>c_i} nv, for every distinct c_i
    head = np.cumsum(nv * ds * ds)
    tail = nv.sum() - np.cumsum(nv)
    f = head + ds * ds * tail
    if len(f) == 0 or f[-1] <= budget:
        return None
    ok = np.nonzero(f <= budget)[0]
    return max(16, int(ds[ok[-1]])) if len(ok) else 16


def link_suggestions(
    edges: DataFrame,
    k: int = 5,
    min_common: int = 2,
    max_center_degree: int | str | None = "auto",
    assume_canonical: bool = False,
) -> DataFrame:
    """(vertex, candidate, common, jaccard, adamic_adar, rank) — for every
    vertex, its top-k non-adjacent candidates by shared-neighbor count
    (rank 1 = strongest; deterministic integer ordering).

    assume_canonical: the degree counts and the already-adjacent anti-join
    require canonical deduped src<dst edges; by default the input is
    canonicalized here (least/greatest + self-loop drop + distinct — one
    extra shuffle).  Pass True to skip when the input is known-canonical
    (e.g. edges_from_lineitem output), which every internal caller is."""
    if not assume_canonical:
        edges = (
            edges.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
    und = edges.select(F.col("src").alias("w"), F.col("dst").alias("n")).unionAll(
        edges.select(F.col("dst").alias("w"), F.col("src").alias("n"))
    )
    # materialize once: deg feeds THREE broadcast legs (centers, deg_a, deg_b)
    # and centers is self-joined — without the cut Spark re-executes the
    # degree aggregation per leg (triangles.py documents the same shape)
    deg = (
        und.groupBy("w")
        .agg(F.count(F.lit(1)).alias("degree"))
        .localCheckpoint(eager=True)
    )
    if max_center_degree == "auto":
        max_center_degree = _auto_center_cap(edges, deg)
    centers = und.join(F.broadcast(deg), "w")
    if max_center_degree is not None:
        centers = centers.where(F.col("degree") <= max_center_degree)
    centers = centers.localCheckpoint(eager=True)
    x, y = centers.alias("x"), centers.alias("y")
    wed = x.join(y, (F.col("x.w") == F.col("y.w")) & (F.col("x.n") < F.col("y.n"))).select(
        F.col("x.n").alias("a"), F.col("y.n").alias("b"), F.col("x.degree").alias("dw")
    )
    scores = (
        wed.groupBy("a", "b")
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.sum(1.0 / F.log(F.col("dw").cast("double"))).alias("aa_raw"),
        )
        .where(F.col("common") >= min_common)
    )
    # drop pairs that are already edges (edge table is canonical src<dst,
    # wedge pairs are a<b — keys line up without re-canonicalizing)
    fresh = scores.join(
        edges.select(F.col("src").alias("a"), F.col("dst").alias("b")),
        ["a", "b"],
        "left_anti",
    )
    da = deg.select(F.col("w").alias("a"), F.col("degree").alias("deg_a"))
    db = deg.select(F.col("w").alias("b"), F.col("degree").alias("deg_b"))
    both = (
        fresh.join(F.broadcast(da), "a")
        .join(F.broadcast(db), "b")
        .select(
            F.col("a").alias("vertex"),
            F.col("b").alias("candidate"),
            "common",
            F.round(F.col("common") / (F.col("deg_a") + F.col("deg_b") - F.col("common")), 6).alias("jaccard"),
            F.round("aa_raw", 6).alias("adamic_adar"),
        )
    )
    mirrored = both.unionAll(
        both.select(
            F.col("candidate").alias("vertex"),
            F.col("vertex").alias("candidate"),
            "common",
            "jaccard",
            "adamic_adar",
        )
    )
    w = Window.partitionBy("vertex").orderBy(F.desc("common"), F.asc("candidate"))
    return (
        mirrored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vertex", "candidate", "common", "jaccard", "adamic_adar",
                F.col("rank").cast("long").alias("rank"))
    )
