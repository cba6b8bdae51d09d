"""Betweenness centrality — Brandes' dependency accumulation (Brandes 2001),
seed-sampled: exact when ``seeds`` covers every vertex, otherwise the
standard subset estimator (Brandes & Pich 2007) summed over the sample (an
unbiased n/k rescale is the caller's one multiplication).

For each seed s, forward phase = level-synchronous BFS carrying shortest-path
counts sigma; backward phase walks levels deepest-first accumulating

    delta(u) += sigma(u)/sigma(w) * (1 + delta(w))   for DAG edges u -> w

and bc(v) = Σ_s delta_s(v) / 2 (undirected halving; seeds' own rows excluded
per Brandes).

Execution (all seeds batched in one state relation — the cluster shape):
- static input: the doubled edge relation (v, nb) hash-partitioned by v and
  localCheckpointed (never re-exchanged).
- forward, per level: frontier (seed, v, sigma) joins the static relation,
  groupBy(seed, nb) sums sigma — one exchange — then an anti-join against
  the settled set drops already-finalized vertices; settled and frontier
  are localCheckpointed per level (constant plans).  Level-synchronous BFS
  finalizes sigma per level on an unweighted graph, so no re-relaxation.
- backward, per level: the DAG edges at depth t (settled@t join und join
  settled@t+1) carry sigma(u)/sigma(w)*(1+delta(w)); groupBy(seed, u) sums
  — one exchange per level.  Levels run T..1 where T = deepest non-empty
  frontier (known from the forward phase, no extra job).

State is |seeds| * n rows; pick |seeds| to the wedge of cluster memory —
the estimator quality grows like sqrt(k) (Brandes-Pich).  Per-level
frontier counts come back with the checkpoint materialization; total jobs
= 2 * eccentricity-bound, the same envelope as diameter.py's sweeps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def _forward_layers(spark, und: DataFrame, seeds: list[int], max_levels: int, scratch: list):
    """Batched level-synchronous BFS from all seeds over the doubled static
    relation: returns the list of settled layers [(seed, v, sigma), …], one
    per BFS level (module docstring forward phase).  Checkpoints append to
    ``scratch`` — the caller releases them."""
    seed_rows = [(int(s),) for s in sorted(set(seeds))]
    frontier = (
        spark.createDataFrame(seed_rows, "seed long")
        .select("seed", F.col("seed").alias("v"), F.lit(1).cast("long").alias("sigma"))
        .localCheckpoint(eager=True)
    )
    scratch.append(frontier)
    # settled layers, one DataFrame per BFS level (sigma final per level)
    layers = [frontier]
    settled = frontier
    for _ in range(max_levels):
        nxt = (
            frontier.hint("shuffle_hash")
            .join(und, "v")
            .groupBy("seed", F.col("nb").alias("v"))
            .agg(F.sum("sigma").alias("sigma"))
            .join(settled.select("seed", "v"), ["seed", "v"], "left_anti")
            .localCheckpoint(eager=True)
        )
        scratch.append(nxt)
        if nxt.isEmpty():
            break
        layers.append(nxt)
        settled = settled.unionAll(nxt.select("seed", "v", "sigma")).localCheckpoint(
            eager=True
        )
        scratch.append(settled)
        frontier = nxt
    return layers


def betweenness(
    edges: DataFrame,
    seeds: list[int],
    max_levels: int = 64,
) -> DataFrame:
    """(vertex, bc) — summed Brandes dependencies over ``seeds`` (module
    docstring), undirected halving applied; vertices unreachable from every
    seed report bc = 0.  Canonical deduped src<dst edges expected."""
    if not seeds:
        raise ValueError("betweenness needs a non-empty seed set")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    und = None
    scratch: list = []  # per-level checkpoints, all released in finally
    try:
        und = (
            edges.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
            .unionAll(edges.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
            .repartition(shuffle_n, "v")
            .localCheckpoint(eager=True)
        )
        layers = _forward_layers(spark, und, seeds, max_levels, scratch)
        # backward accumulation, deepest level first
        delta = None  # (seed, v, delta) for levels > current
        out = None
        for t in range(len(layers) - 1, 0, -1):
            wlayer = layers[t]
            if delta is not None:
                wlayer = wlayer.join(delta, ["seed", "v"], "left").select(
                    "seed", "v", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta")
                )
            else:
                wlayer = wlayer.select("seed", "v", "sigma", F.lit(0.0).alias("delta"))
            contrib = (
                wlayer.select(
                    "seed",
                    F.col("v").alias("nb"),
                    ((1.0 + F.col("delta")) / F.col("sigma")).alias("ratio"),
                )
                .hint("shuffle_hash")
                .join(und, "nb")
                .select("seed", "v", "ratio")
                .join(layers[t - 1].hint("shuffle_hash"), ["seed", "v"])
                .groupBy("seed", "v")
                .agg((F.sum("ratio") * F.first("sigma")).alias("delta"))
                .localCheckpoint(eager=True)
            )
            scratch.append(contrib)
            delta = contrib
            proj = wlayer.select("seed", "v", "delta")
            out = proj if out is None else out.unionAll(proj)
        universe = und.select(F.col("v").alias("vertex")).distinct()
        if out is None:  # no seed reached anything (isolated seeds)
            return universe.select("vertex", F.lit(0.0).alias("bc")).localCheckpoint(
                eager=True
            )
        summed = out.groupBy(F.col("v").alias("vertex")).agg(
            (F.sum("delta") / 2.0).alias("bc_raw")
        )
        # materialized so the static relation + every per-level checkpoint can
        # be actually released below (storage.release drops checkpoint blocks
        # for real — a lazy result over und would lose its inputs)
        return universe.join(summed, "vertex", "left").select(
            "vertex", F.round(F.coalesce("bc_raw", F.lit(0.0)), 6).alias("bc")
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if und is not None:
            release(und)
        for df in scratch:
            release(df)


def edge_betweenness(
    edges: DataFrame,
    seeds: list[int],
    max_levels: int = 64,
) -> DataFrame:
    """(src, dst, ebc) — Brandes EDGE betweenness over ``seeds`` (exact when
    seeds cover every vertex, else the Brandes-Pich subset estimator): for
    each shortest-path-DAG edge u→w the dependency σ(u)·(1+δ(w))/σ(w),
    summed over seeds, canonicalized least<greatest, halved (each
    undirected pair contributes from both endpoints when seeds are
    complete).  Every input edge reports a row (0.0 when on no counted
    shortest path) — the Girvan-Newman "remove the max-ebc edge" loop wants
    the complete relation.

    Same two-phase plan as :func:`betweenness` (shared forward BFS — one
    exchange per level, all seeds batched); the backward phase emits the
    per-DAG-edge terms BEFORE the groupBy(seed, u) that the vertex variant
    aggregates with, so edge scores cost the same superstep chain plus one
    (u, w)-keyed aggregate at the end.  δ here is Σ term (float-op order
    mirrored in the SQL oracle)."""
    if not seeds:
        raise ValueError("edge_betweenness needs a non-empty seed set")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    und = None
    canon = None
    scratch: list = []
    try:
        canon = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        und = (
            canon.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
            .unionAll(canon.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
            .repartition(shuffle_n, "v")
            .localCheckpoint(eager=True)
        )
        layers = _forward_layers(spark, und, seeds, max_levels, scratch)
        if len(layers) > max_levels:
            pass  # forward loop broke on empty frontier; bound respected
        delta = None  # (seed, v, delta) for the level below
        edge_out = None
        for t in range(len(layers) - 1, 0, -1):
            wlayer = layers[t]
            if delta is not None:
                wlayer = wlayer.join(delta, ["seed", "v"], "left").select(
                    "seed", "v", "sigma", F.coalesce("delta", F.lit(0.0)).alias("delta")
                )
            else:
                wlayer = wlayer.select("seed", "v", "sigma", F.lit(0.0).alias("delta"))
            terms = (
                wlayer.select(
                    "seed",
                    F.col("v").alias("w"),
                    ((1.0 + F.col("delta")) / F.col("sigma")).alias("ratio"),
                )
                .hint("shuffle_hash")
                .join(
                    und.select(F.col("v").alias("u"), F.col("nb").alias("w")), "w"
                )
                .join(
                    layers[t - 1]
                    .hint("shuffle_hash")
                    .select("seed", F.col("v").alias("u"), "sigma"),
                    ["seed", "u"],
                )
                .select(
                    "seed", "u", "w", (F.col("ratio") * F.col("sigma")).alias("term")
                )
                .localCheckpoint(eager=True)
            )
            scratch.append(terms)
            delta = (
                terms.groupBy("seed", F.col("u").alias("v"))
                .agg(F.sum("term").alias("delta"))
                .localCheckpoint(eager=True)
            )
            scratch.append(delta)
            proj = terms.select("seed", "u", "w", "term")
            edge_out = proj if edge_out is None else edge_out.unionAll(proj)
        if edge_out is None:
            return canon.select(
                "src", "dst", F.lit(0.0).alias("ebc")
            ).localCheckpoint(eager=True)
        summed = (
            edge_out.select(
                F.least("u", "w").alias("src"),
                F.greatest("u", "w").alias("dst"),
                "term",
            )
            .groupBy("src", "dst")
            .agg((F.sum("term") / 2.0).alias("ebc_raw"))
        )
        return canon.join(summed, ["src", "dst"], "left").select(
            "src",
            "dst",
            F.round(F.coalesce("ebc_raw", F.lit(0.0)), 6).alias("ebc"),
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in (und, canon):
            if df is not None:
                release(df)
        for df in scratch:
            release(df)


def girvan_newman_split(
    edges: DataFrame,
    seeds: list[int],
    n_remove: int,
    max_levels: int = 64,
    max_rounds: int = 50,
) -> DataFrame:
    """(vertex, component): one Girvan-Newman step at scale — score every
    edge with :func:`edge_betweenness` (seed-sampled), remove the
    ``n_remove`` highest-scoring edges under the deterministic total order
    (ebc DESC, src ASC, dst ASC — ebc is the ROUND(6) column, so both
    engines order identically), and label the surviving components with
    the star-contraction CC fixpoint (O(log² n) rounds, diameter-free).
    Vertices isolated by the removal keep their own id as the component
    (the min-label convention).

    Classic GN iterates edge-at-a-time with full rescoring — O(m) Brandes
    runs, hopeless at scale; the batch variant (remove the top block, then
    rescore) is the standard large-graph compromise and one call here is
    exactly that block step.  Cost: one edge_betweenness chain + one
    distributed top-k (TakeOrdered, no global window) + one star-contraction
    CC — all existing oracle-checked kernels, composed.
    """
    if n_remove < 1:
        raise ValueError("n_remove must be >= 1")
    from .components import connected_components_stars

    ebc = edge_betweenness(edges, seeds, max_levels)
    removed = None
    labels = None
    try:
        removed = (
            ebc.orderBy(F.desc("ebc"), F.asc("src"), F.asc("dst"))
            .limit(n_remove)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        resid = ebc.select("src", "dst").join(removed, ["src", "dst"], "left_anti")
        labels, _info = connected_components_stars(resid, max_rounds=max_rounds)
        universe = (
            ebc.select(F.col("src").alias("vertex"))
            .unionAll(ebc.select(F.col("dst").alias("vertex")))
            .distinct()
        )
        return (
            universe.join(labels, "vertex", "left")
            .select(
                "vertex",
                F.coalesce("component", F.col("vertex")).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        release(ebc)
        if removed is not None:
            release(removed)
        if labels is not None:
            release(labels)
