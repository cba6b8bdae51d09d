"""Densest-subgraph peeling (Bahmani, Kumar & Vassilvitskii, "Densest
Subgraph in Streaming and MapReduce", VLDB 2012).

Charikar's greedy made MapReduce-native: each round removes EVERY vertex
whose degree is ≤ (1+ε)·(2m/n) — the average degree of the current
subgraph scaled by the slack — which shrinks the vertex set geometrically,
so O(log_{1+ε} n) rounds suffice and the best round's density is a
(2+2ε)-approximation of the optimum.  This is the scale-shaped version of
the problem: Charikar's original one-vertex-at-a-time peel is inherently
sequential (n rounds); the ε-batched peel is the price of O(log n) rounds.

Exactness discipline (the summary.py recipe): with ε = enum/eden − 1
rational, the removal test  deg·n·eden ≤ 2m·enum  is pure BIGINT
arithmetic, densities are compared via one IEEE double division (exactly
rounded, identical cross-engine), and ties break on the earlier round —
so the DuckDB oracle replays the peel round for round and hash-matches.

Per round: one groupBy degree count over the doubled relation + two
semi-joins to drop edges with a removed endpoint (broadcast-eligible at
sandbox scale, shuffle-hash beyond) + one scalar aggregate for (n, m).
The relation only shrinks; round stats come back to the driver as single
rows (no O(n) collect).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densest_subgraph_peel(
    edges: DataFrame,
    rounds: int = 6,
    enum: int = 11,
    eden: int = 10,
) -> DataFrame:
    """(round, n_vertices, n_edges, density, is_best) for each non-empty
    peeling round over the canonical undirected edge table; round 0 is the
    input graph.  density = round(m/n, 6); is_best marks the maximum
    density (earliest round on exact ties) — its round's survivors are the
    (2·enum/eden)-approximate densest subgraph.  ε = enum/eden − 1."""
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    if enum <= 0 or eden <= 0 or enum < eden:
        raise ValueError("need enum >= eden > 0 (epsilon = enum/eden - 1 >= 0)")
    spark = edges.sparkSession
    cur = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    stats: list[tuple[int, int, int]] = []
    for r in range(rounds + 1):
        nb = cur.select(F.col("src").alias("u")).unionAll(
            cur.select(F.col("dst").alias("u"))
        )
        deg = nb.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
        row = deg.agg(
            F.count(F.lit(1)).alias("n"), F.sum("c").alias("two_m")
        ).collect()[0]
        n, m = int(row["n"] or 0), int(row["two_m"] or 0) // 2
        if n == 0:
            break
        stats.append((r, n, m))
        if r == rounds:
            break
        # keep v iff deg(v)·n·eden > 2m·enum  (exact BIGINT inequality)
        keep = deg.where(
            F.col("c") * F.lit(n) * F.lit(eden) > F.lit(2 * m) * F.lit(enum)
        ).select("u")
        ks = keep.withColumnRenamed("u", "src")
        kd = keep.withColumnRenamed("u", "dst")
        if n <= 5_000_000:  # survivor list is small: ship it, don't shuffle edges
            ks, kd = F.broadcast(ks), F.broadcast(kd)
        cur = (
            cur.join(ks, "src", "left_semi")
            .join(kd, "dst", "left_semi")
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
    out = spark.createDataFrame(
        [(r, n, m) for r, n, m in stats], "round long, n_vertices long, n_edges long"
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("density"), F.asc("round"))
    return (
        out.withColumn("density", F.round(F.col("n_edges") / F.col("n_vertices"), 6))
        .withColumn("is_best", F.row_number().over(w) == 1)
        .select("round", "n_vertices", "n_edges", "density", "is_best")
    )
