"""Weighted single/multi-source shortest paths (distributed Bellman-Ford).

Level-synchronous relaxation over the undirected weighted edge table — the
weighted generalization of graph/diameter.py's BFS (which is the w=1
special case): per superstep every edge relaxes both directions,
    dist'(v) = min(dist(v), min_{(u,v)} dist(u) + w(u,v)),
from dist_0(seed) = 0.  Distances stay exact BIGINTs for integer weights,
so a fixed-horizon run replays as chained SQL CTEs and hash-matches
cross-engine (the labelprop/ppr oracle recipe).

Plan shape per superstep (pure JVM, zero Python in the loop): the doubled
weighted relation is hash-partitioned ONCE by the relax key and
lineage-truncated; the state join is then co-located (state arrives
hash-partitioned on the same key from the previous groupBy), and the
union + groupBy(vertex).min is the ONE exchange — n + frontier-scatter
rows of (vertex, long).  At 1000 executors the static side never moves
after the initial partitioning.

Fixpoint costs nothing extra to detect: |reached| is monotone
non-decreasing and sum(dist) over reached is monotone non-increasing, so
the loop stops early when the (count, total) pair repeats — two scalars
read off the state that was being checkpointed anyway.  Early stop is
oracle-safe: a fixpoint is idempotent, so the fixed-horizon SQL replay
lands on the identical relation.

Bellman-Ford horizon: max_supersteps bounds the hop count of discovered
paths; n-1 supersteps is the exact-everywhere bound, but on the
small-diameter power-law graphs this engine targets the fixpoint arrives
in ~diameter rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def shortest_paths(
    edges: DataFrame,
    sources: list[int],
    max_supersteps: int = 8,
    weight_col: str | None = None,
) -> DataFrame:
    """(vertex, dist) for every vertex reachable from the nearest of
    ``sources`` within ``max_supersteps`` relaxation rounds; dist is the
    exact integer shortest-path weight (min over seeds).  Unreached
    vertices are absent.  ``weight_col`` names a non-negative integer edge
    weight; None means unit weights (BFS-hop distances).
    """
    if not sources:
        raise ValueError("sources must be a non-empty list of vertex ids")
    if max_supersteps < 1:
        raise ValueError("max_supersteps must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    und = None
    try:
        w = (
            F.col(weight_col).cast("long") if weight_col is not None else F.lit(1).cast("long")
        )
        ew = edges.select(F.col("src"), F.col("dst"), w.alias("w"))
        und = (
            ew.select(F.col("src").alias("frm"), F.col("dst").alias("to"), "w")
            .unionAll(ew.select(F.col("dst").alias("frm"), F.col("src").alias("to"), "w"))
            .repartition(shuffle_n, "frm")
            .localCheckpoint(eager=True)
        )
        state = (
            spark.createDataFrame(
                [(int(s),) for s in sorted(set(sources))], "vertex long"
            )
            .select("vertex", F.lit(0).cast("long").alias("dist"))
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        prev_sig = (len(sources), 0)
        for _ in range(max_supersteps):
            cand = (
                und.join(
                    state.select(F.col("vertex").alias("frm"), "dist").hint("shuffle_hash"),
                    "frm",
                )
                .select(F.col("to").alias("vertex"), (F.col("dist") + F.col("w")).alias("dist"))
            )
            prev = state
            state = (
                prev.unionAll(cand)
                .groupBy("vertex")
                .agg(F.min("dist").alias("dist"))
                .localCheckpoint(eager=True)
            )
            release(prev)
            row = state.agg(
                F.count(F.lit(1)).alias("c"), F.sum("dist").alias("t")
            ).collect()[0]
            sig = (int(row["c"]), int(row["t"] or 0))
            if sig == prev_sig:
                break
            prev_sig = sig
        return state
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if und is not None:
            release(und)


WIDTH_INF = 1 << 31  # seed sentinel: wider than any valid capacity (and
# small enough that the fixpoint signature SUM over 2^31 vertices stays a
# BIGINT — capacities are validated < WIDTH_INF below, fail-fast)


def widest_paths(
    edges: DataFrame,
    sources: list[int],
    max_supersteps: int = 8,
    capacity_col: str | None = None,
) -> DataFrame:
    """(vertex, width) — the max-min BOTTLENECK path width from the widest
    of ``sources``: width(v) = max over paths P(seed→v) of min edge
    capacity on P (maximum-capacity routing / network-reliability dual of
    ``shortest_paths``; the same Bellman-Ford shape with (min,+) swapped
    for (max, min)).  Seeds carry the ``WIDTH_INF`` sentinel (a path of
    zero edges has no bottleneck); unreached vertices are absent.
    ``capacity_col`` names a positive integer capacity < 2^31 (validated,
    fail-fast — the bound keeps the monotone (count, sum) fixpoint
    signature overflow-free); None = unit.

    Same plan per superstep as shortest_paths: static doubled relation
    partitioned once by the relax key, co-located state join, ONE
    max-merge exchange; widths are monotone non-decreasing and so is
    their (count, sum) signature, so the fixpoint is detected from the
    two scalars already at hand, and a fixed-horizon run replays as
    chained SQL CTEs (exact BIGINTs end to end).
    """
    if not sources:
        raise ValueError("sources must be a non-empty list of vertex ids")
    if max_supersteps < 1:
        raise ValueError("max_supersteps must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    und = None
    try:
        w = (
            F.col(capacity_col).cast("long")
            if capacity_col is not None
            else F.lit(1).cast("long")
        )
        ew = edges.select(F.col("src"), F.col("dst"), w.alias("w"))
        bad = ew.where((F.col("w") <= 0) | (F.col("w") >= WIDTH_INF)).limit(1)
        if bad.count():
            raise ValueError(
                "widest_paths capacities must be positive integers < 2^31"
            )
        und = (
            ew.select(F.col("src").alias("frm"), F.col("dst").alias("to"), "w")
            .unionAll(ew.select(F.col("dst").alias("frm"), F.col("src").alias("to"), "w"))
            .repartition(shuffle_n, "frm")
            .localCheckpoint(eager=True)
        )
        state = (
            spark.createDataFrame(
                [(int(s),) for s in sorted(set(sources))], "vertex long"
            )
            .select("vertex", F.lit(WIDTH_INF).cast("long").alias("width"))
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        prev_sig = None
        for _ in range(max_supersteps):
            cand = und.join(
                state.select(F.col("vertex").alias("frm"), "width").hint(
                    "shuffle_hash"
                ),
                "frm",
            ).select(
                F.col("to").alias("vertex"),
                F.least(F.col("width"), F.col("w")).alias("width"),
            )
            prev = state
            state = (
                prev.unionAll(cand)
                .groupBy("vertex")
                .agg(F.max("width").alias("width"))
                .localCheckpoint(eager=True)
            )
            release(prev)
            row = state.agg(
                F.count(F.lit(1)).alias("c"), F.sum("width").alias("t")
            ).collect()[0]
            sig = (int(row["c"]), int(row["t"] or 0))
            if sig == prev_sig:
                break
            prev_sig = sig
        return state
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if und is not None:
            release(und)
