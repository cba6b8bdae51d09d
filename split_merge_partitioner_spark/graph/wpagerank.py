"""Weighted PageRank over an undirected weighted edge table.

r_{t+1}(v) = (1−d)/n + d · Σ_{u ∈ Γ(v)} r_t(u) · w(u,v) / S(u),
S(u) = Σ incident weights — the natural weighted generalization (each
vertex splits its rank among neighbors proportionally to edge weight).
The unweighted engine paths live in pagerank.py with five execution
modes and a convergence loop; this module is the weighted variant on the
shared exact-superstep recipe (ppr.py): fixed horizon, pure JVM, ONE
exchange per superstep.  No dangling handling is needed on an edge-table
graph (every vertex has ≥ 1 incident edge by construction); degree-0
vertices simply don't exist in the relation.

Execution: static relation (v, nb, w, s_nb) — the doubled weighted edges
carrying the NEIGHBOR's weight sum so the superstep needs no second join
(the walks.py trick) — hash-partitioned by nb and localCheckpointed;
state (vertex, rank) partitioned by vertex.  Per superstep: co-located
shuffle_hash join on nb + one map-side-combined groupBy(v) — the
explain-audited one-exchange shape (BENCH/PLANS.md).

Floats, honestly: rank is a double and Σ is order-sensitive in the last
ulp; the driver oracle follows the pagerank_10iter precedent (ROUND to 9
decimals after a fixed iteration count absorbs the ulp).  Exactness-first
variants of this family (integer eigencentrality, exact-rational PPR
moments) live in their own modules.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def weighted_pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    damping: float = 0.85,
    weight_col: str = "w",
) -> DataFrame:
    """(vertex, rank) after ``n_iter`` weighted power-iteration steps over
    the undirected canonical edge table with positive weights in
    ``weight_col``; ranks sum to 1."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    und = None
    try:
        dbl = edges.select(
            F.col("src").alias("v"), F.col("dst").alias("nb"), F.col(weight_col).alias("w")
        ).unionAll(
            edges.select(
                F.col("dst").alias("v"), F.col("src").alias("nb"), F.col(weight_col).alias("w")
            )
        )
        bad = edges.where(F.col(weight_col) <= 0).count()
        if bad:
            raise ValueError(
                f"{bad} edges have non-positive '{weight_col}' — a zero weight"
                " sum would silently leak rank mass (S(u)=0 division);"
                " filter or reweight first"
            )
        sw = dbl.groupBy(F.col("v").alias("nb")).agg(F.sum("w").alias("s_nb"))
        und = (
            dbl.join(sw, "nb")
            .select("v", "nb", "w", "s_nb")
            .repartition(shuffle_n, "nb")
            .localCheckpoint(eager=True)
        )
        n = und.select("v").distinct().count()
        if n == 0:
            return spark.createDataFrame([], "vertex long, rank double")
        base = (1.0 - damping) / n
        state = (
            und.select(F.col("v").alias("vertex"))
            .distinct()
            .select("vertex", F.lit(1.0 / n).alias("rank"))
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        for _ in range(n_iter):
            contribs = state.select(F.col("vertex").alias("nb"), F.col("rank").alias("r"))
            prev = state
            state = (
                und.join(contribs.hint("shuffle_hash"), "nb")
                .groupBy(F.col("v").alias("vertex"))
                .agg(
                    (
                        F.lit(base)
                        + F.lit(damping)
                        * F.sum(F.col("r") * F.col("w") / F.col("s_nb"))
                    ).alias("rank")
                )
                # the groupBy's hashpartitioning(vertex) already satisfies
                # next superstep's join distribution — no extra repartition
                .localCheckpoint(eager=True)
            )
            release(prev)
        return state
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if und is not None:
            release(und)
