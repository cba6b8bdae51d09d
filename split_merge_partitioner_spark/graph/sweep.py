"""PPR sweep cut — local community detection (Andersen, Chung & Lang,
FOCS 2006): order vertices by personalized-PageRank score, then report the
conductance of every prefix of the ordering; the minimum-conductance
prefix is the seed's local community.  This is the step that turns the
ppr operator into an actual clustering primitive.

Exactness: the sweep itself is pure integer arithmetic — prefix volumes
are degree sums, prefix cuts are ±1 edge events, conductance is a
floor-scaled ppm division.  The only float is the PPR ordering key, taken
at the same ROUND(·, 9) the ppr oracle hash-matches, with vertex-id
tie-break — so the ordering (and therefore every integer after it) is
deterministic cross-engine.

Scale shape: local communities are SMALL — the sweep only ever needs the
top ``k_max`` scores.  Execution: one global top-k of the score relation
(TakeOrdered-class, no full sort materialized), a semi-join restricting
edges to those touching the prefix candidates (an edge with BOTH endpoints
outside the top-k can never cross a prefix boundary ≤ k_max), then ±1
event generation and ONE window cumsum over k_max rows — the report
relation, never the graph.  2m and the degree relation come from the same
scan the ppr call already makes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ppr import personalized_pagerank


def ppr_sweep_cut(
    edges: DataFrame,
    seeds: list[int],
    k_max: int = 64,
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """(k, vertex, ppr, vol, cut, conductance_ppm) for prefixes k = 1..k_max
    of the PPR ordering (score desc, vertex asc): vertex = the rank-k
    vertex, vol = Σ degree over the prefix, cut = edges with exactly one
    endpoint inside, conductance_ppm = 1e6*cut // max(min(vol, 2m-vol), 1).
    argmin(conductance_ppm) over k is the ACL local community around
    ``seeds``.  A prefix that swallows the ENTIRE graph (vol = 2m) has
    cut 0 and conductance 0/0 — the degenerate non-community — so such
    rows are excluded rather than reported as a spurious argmin."""
    if k_max < 1:
        raise ValueError("k_max must be >= 1")
    scores = personalized_pagerank(edges, seeds, damping=damping, n_iter=n_iter)
    e = edges.select("src", "dst")
    und = e.select(F.col("src").alias("v")).unionAll(e.select(F.col("dst").alias("v")))
    deg = und.groupBy(F.col("v").alias("vertex")).agg(
        F.count(F.lit(1)).cast("long").alias("degree")
    )
    two_m = e.count() * 2

    topk = (
        scores.orderBy(F.col("ppr").desc(), F.col("vertex").asc())
        .limit(k_max)
        # the limited relation is k_max rows — a single-partition window
        # over it is the report shape, not a graph-scale sort
        .withColumn(
            "k",
            F.row_number().over(
                Window.orderBy(F.col("ppr").desc(), F.col("vertex").asc())
            ),
        )
        .join(deg, "vertex")
        .select("k", "vertex", "ppr", "degree")
    )

    ra = topk.select(F.col("vertex").alias("src"), F.col("k").alias("ka"))
    rb = topk.select(F.col("vertex").alias("dst"), F.col("k").alias("kb"))
    edge_ranks = (
        e.join(ra, "src", "left")
        .join(rb, "dst", "left")
        .where(F.col("ka").isNotNull() | F.col("kb").isNotNull())
        .select(
            F.least(F.col("ka"), F.col("kb")).alias("kmin"),
            F.greatest(F.col("ka"), F.col("kb")).alias("kmax"),
            (F.col("ka").isNotNull() & F.col("kb").isNotNull()).alias("both"),
        )
        # least/greatest are null-skipping in Spark, so a one-sided edge
        # yields kmin = kmax = the inside rank with both = false
    )
    opens = edge_ranks.select(F.col("kmin").alias("k"), F.lit(1).alias("dcut"))
    closes = edge_ranks.where(F.col("both")).select(
        F.col("kmax").alias("k"), F.lit(-1).alias("dcut")
    )
    cut_events = (
        opens.unionAll(closes)
        .groupBy("k")
        .agg(F.sum("dcut").cast("long").alias("dcut"))
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    return (
        topk.join(cut_events, "k", "left")
        .select(
            "k",
            "vertex",
            "ppr",
            "degree",
            F.coalesce("dcut", F.lit(0)).cast("long").alias("dcut"),
        )
        .select(
            F.col("k").cast("long").alias("k"),
            "vertex",
            "ppr",
            F.sum("degree").over(w).cast("long").alias("vol"),
            F.sum("dcut").over(w).cast("long").alias("cut"),
        )
        .where(F.col("vol") < F.lit(two_m))
        .select(
            "k",
            "vertex",
            "ppr",
            "vol",
            "cut",
            F.expr(
                f"CAST(1000000 * cut AS BIGINT) DIV "
                f"GREATEST(LEAST(vol, CAST({two_m} AS BIGINT) - vol), 1)"
            ).alias("conductance_ppm"),
        )
    )
