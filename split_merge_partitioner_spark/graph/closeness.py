"""Harmonic and closeness centrality from a sampled seed set.

Harmonic centrality h(v) = Σ_{u≠v} 1/d(u, v) (Boldi & Vigna, "Axioms for
Centrality", 2014 — the well-behaved closeness variant on disconnected
graphs); estimated from k sampled seeds the standard way (Eppstein-Wang
2004): ĥ(v) = Σ_{s∈S} 1/d(s, v), unbiased after the caller's n/k rescale.
This is the exact-BFS companion to HyperBall (graph/hyperanf.py), which
estimates the same quantity probabilistically when even k·n state is too
much — here distances are EXACT and per-seed.

Exactness trick (the eigencentrality/summary recipe): 1/d is not exactly
representable, so the engine returns the INTEGER numerator over the common
denominator L = lcm(1, …, max_dist): harmonic_num(v) = Σ_s L/d(s, v) —
every term divides L exactly, all arithmetic is BIGINT, and the one
ROUND()ed IEEE division harmonic = harmonic_num/L happens once at the end.
The DuckDB oracle replays the BFS as chained min-merge CTEs and
hash-matches every row.  n_seeds_reached and sum_dist ride along so
callers can form any closeness variant (classic, Wasserman-Faust) from
exact integers.

Execution — the betweenness forward shape: all seeds batched in ONE state
relation keyed (seed, v); static doubled relation hash-partitioned by v
and localCheckpointed.  Per BFS level: frontier ⋈ und (co-located,
shuffle_hash), distinct on (seed, nb) — one exchange — then an anti-join
against the visited set; visited/frontier localCheckpointed per level
(constant, lineage-free plans).  Job count = min(eccentricity, max_dist),
state |S|·n rows; pick |S| to cluster memory, estimator error falls as
1/√k.  max_dist truncates the sum exactly like HyperBall's horizon — a
documented underestimate on graphs with eccentricity > max_dist (set it
to the approx_diameter output when that matters).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def _seed_bfs(edges: DataFrame, seeds: list[int], max_dist: int, scratch: list):
    """Batched exact BFS from ``seeds`` over the undirected edge table:
    returns (und, visited) where visited = (seed, v, dist) rows for every
    vertex within ``max_dist`` hops of each seed (dist 0 = the seed itself).
    All checkpointed intermediates (including the returned relations) are
    appended to ``scratch`` — the caller's finally block owns the release.
    One co-located join + distinct + anti-join per level; all seeds ride a
    single state relation, so job count is the eccentricity bound, not
    |seeds|."""
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = (
        edges.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
        .unionAll(edges.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
        .repartition(shuffle_n, "v")
        .localCheckpoint(eager=True)
    )
    scratch.append(und)
    seed_rows = [(int(s),) for s in sorted(set(seeds))]
    frontier = (
        spark.createDataFrame(seed_rows, "seed long")
        .select("seed", F.col("seed").alias("v"))
        .localCheckpoint(eager=True)
    )
    scratch.append(frontier)
    visited = frontier.select("seed", "v", F.lit(0).cast("long").alias("dist"))
    for t in range(1, max_dist + 1):
        nxt = (
            frontier.hint("shuffle_hash")
            .join(und, "v")
            .select("seed", F.col("nb").alias("v"))
            .distinct()
            .join(visited.select("seed", "v"), ["seed", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        scratch.append(nxt)
        if nxt.isEmpty():
            break
        visited = visited.unionAll(
            nxt.select("seed", "v", F.lit(t).cast("long").alias("dist"))
        ).localCheckpoint(eager=True)
        scratch.append(visited)
        frontier = nxt
    return und, visited


def harmonic_closeness(
    edges: DataFrame,
    seeds: list[int],
    max_dist: int = 16,
) -> DataFrame:
    """(vertex, n_seeds_reached, sum_dist, harmonic_num, harmonic) over the
    undirected canonical edge table: exact per-seed BFS distances from
    ``seeds``, truncated at ``max_dist`` hops; harmonic_num = Σ L/d with
    L = lcm(1..max_dist), harmonic = round(harmonic_num/L, 6).  Seed self
    rows (d = 0) are excluded; vertices no seed reaches report zeros."""
    if not seeds:
        raise ValueError("harmonic_closeness needs a non-empty seed set")
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    if max_dist > 42:
        # lcm(1..43) = 9.42e18 > 2^63-1: the BIGINT numerator would overflow
        # (ANSI throw or silent wrap).  lcm(1..42) ≈ 2.19e17 still leaves
        # ~40 bits of headroom for the per-vertex sum over seeds.
        raise ValueError(
            "max_dist must be <= 42: lcm(1..max_dist) exceeds int64 beyond "
            "that, corrupting harmonic_num. For wider horizons use "
            "graph/hyperanf.py (probabilistic, no common-denominator trick) "
            "or chunk the seed set and sum float harmonics driver-side."
        )
    big_l = math.lcm(*range(1, max_dist + 1))
    spark = edges.sparkSession
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    scratch: list = []  # per-level checkpoints, all released in finally
    try:
        und, visited = _seed_bfs(edges, seeds, max_dist, scratch)
        scores = (
            visited.where(F.col("dist") >= 1)
            .groupBy(F.col("v").alias("vertex"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_seeds_reached"),
                F.sum("dist").cast("long").alias("sum_dist"),
                # L is divisible by every dist <= max_dist, so integer
                # division is exact — no float enters until the final round
                F.sum(F.expr(f"CAST({big_l} AS BIGINT) div dist"))
                .cast("long")
                .alias("harmonic_num"),
            )
        )
        universe = und.select(F.col("v").alias("vertex")).distinct()
        # materialized so the static relation + every per-level state can be
        # actually released below (storage.release drops checkpoint blocks
        # for real — a lazy result over und would lose its inputs)
        return universe.join(scores, "vertex", "left").select(
            "vertex",
            F.coalesce("n_seeds_reached", F.lit(0).cast("long")).alias("n_seeds_reached"),
            F.coalesce("sum_dist", F.lit(0).cast("long")).alias("sum_dist"),
            F.coalesce("harmonic_num", F.lit(0).cast("long")).alias("harmonic_num"),
            F.round(
                F.coalesce("harmonic_num", F.lit(0).cast("long")) / F.lit(big_l), 6
            ).alias("harmonic"),
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in scratch:  # includes und — _seed_bfs appends it
            release(df)


def eccentricity_profile(
    edges: DataFrame,
    seeds: list[int],
    max_dist: int = 16,
) -> DataFrame:
    """(seed, ecc, n_reached, sum_dist) per seed over the undirected edge
    table: ecc = max exact BFS distance (truncated at ``max_dist`` — the
    harmonic_closeness horizon contract: a documented lower bound when the
    true eccentricity exceeds it), n_reached / sum_dist over the reached
    non-self vertices.  max(ecc) lower-bounds the graph diameter and
    min(ecc) upper-bounds nothing but is the standard radius estimate from
    a seed sample — the iFUB-style bound bookkeeping.

    Same execution shape as harmonic_closeness (shared _seed_bfs): all
    seeds in one state relation, one co-located join + anti-join per level,
    O(eccentricity) supersteps regardless of |seeds|, statics and per-level
    checkpoints released before return.
    """
    if not seeds:
        raise ValueError("eccentricity_profile needs a non-empty seed set")
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    spark = edges.sparkSession
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    scratch: list = []
    try:
        _, visited = _seed_bfs(edges, seeds, max_dist, scratch)
        return (
            visited.groupBy("seed")
            .agg(
                F.max("dist").cast("long").alias("ecc"),
                F.sum((F.col("dist") >= 1).cast("long")).alias("n_reached"),
                F.sum("dist").cast("long").alias("sum_dist"),
            )
            # materialize before the finally block drops the BFS state
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in scratch:
            release(df)


def effective_diameter(
    edges: DataFrame,
    seeds: list[int],
    q_ppm: int = 900_000,
    max_dist: int = 16,
) -> DataFrame:
    """One row (eff_diameter, t_ceil, n_pairs): the q-quantile effective
    diameter (Boldi-Vigna style, q_ppm parts-per-million — 900000 = the
    classic 90%) of the EXACT distance distribution from ``seeds``,
    linearly interpolated between the two straddling radii:

        eff = t − 1 + (q·N − cum(t−1)) / (cum(t) − cum(t−1)),

    where cum(t) counts (seed, vertex) pairs at distance ≤ t.  Exact
    integer BFS counts (the _seed_bfs batched chain — one exchange per
    level for ALL seeds); the only floats are the final target/interpolate
    ops, mirrored verbatim in the SQL oracle.  The denominator is pairs
    within the ``max_dist`` horizon (the documented harmonic_closeness
    truncation convention), so the quantile always resolves; seeds are the
    scale dial exactly as in betweenness/closeness (Brandes-Pich style
    sampling of the distance distribution).
    """
    if not seeds:
        raise ValueError("effective_diameter needs a non-empty seed set")
    if not 0 < q_ppm <= 1_000_000:
        raise ValueError("q_ppm must be in (0, 1e6]")
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    spark = edges.sparkSession
    scratch: list = []
    try:
        _, visited = _seed_bfs(edges, seeds, max_dist, scratch)
        rows = (
            visited.groupBy("dist")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .orderBy("dist")
            .collect()
        )  # <= max_dist + 1 rows: a constant-size driver aggregate
        total = sum(int(r.cnt) for r in rows)
        target = q_ppm / 1_000_000.0 * total
        cum = 0
        t = prev = 0
        for r in rows:
            prev = cum
            cum += int(r.cnt)
            t = int(r.dist)
            if cum >= target:
                break
        eff = max(0.0, t - 1 + (target - prev) / (cum - prev))
        return spark.createDataFrame(
            [(eff, t, total)],
            "eff_diameter double, t_ceil long, n_pairs long",
        ).select(
            F.round("eff_diameter", 6).alias("eff_diameter"), "t_ceil", "n_pairs"
        )
    finally:
        for df in scratch:
            release(df)
