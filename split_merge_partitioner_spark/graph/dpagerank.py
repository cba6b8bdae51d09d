"""Directed PageRank with dangling-mass redistribution — the canonical
web-graph form (Page et al. 1999; direction is semantic, src → dst).

r_{t+1}(v) = (1−d)/n + d·( Σ_{u→v} r_t(u)/outdeg(u) + D_t/n ),
D_t = Σ_{outdeg(u)=0} r_t(u) — dangling vertices spread their rank
uniformly, keeping Σr = 1 exactly (up to float ulp) instead of leaking
mass every step.  The undirected engine paths (pagerank.py, five
execution modes) double the edge relation so dangling never arises; this
module is the directed variant on the shared one-exchange superstep
recipe, with the dangling sum as ONE extra scalar aggregate per step
(a driver double, not a relation).

Execution: static relation (dst gather key) carries the SOURCE's
out-degree (the walks.py no-second-join trick), hash-partitioned by src
and localCheckpointed; per superstep one co-located shuffle_hash join +
one map-side-combined groupBy(dst) + one 1-row dangling aggregate.
Vertices with in-degree 0 still receive base + dangling share via the
left join against the universe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def directed_pagerank(
    edges: DataFrame,
    n_iter: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """(vertex, rank) after ``n_iter`` directed power-iteration steps over
    (src, dst) edges taken AS GIVEN (no canonicalization; parallel edges
    deduped); ranks sum to 1."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rel = None
    universe = None
    try:
        e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
        outdeg = e.groupBy(F.col("src").alias("u")).agg(
            F.count(F.lit(1)).alias("od")
        )
        rel = (
            e.join(outdeg, e.src == outdeg.u)
            .select("src", "dst", "od")
            .repartition(shuffle_n, "src")
            .localCheckpoint(eager=True)
        )
        universe = (
            e.select(F.col("src").alias("vertex"))
            .unionAll(e.select(F.col("dst").alias("vertex")))
            .distinct()
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        n = universe.count()
        if n == 0:
            return spark.createDataFrame([], "vertex long, rank double")
        state = universe.select("vertex", F.lit(1.0 / n).alias("rank")).localCheckpoint(
            eager=True
        )
        return _uniform_teleport_supersteps(
            rel, universe, state, n, n_iter, damping
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in (rel, universe):
            if df is not None:
                release(df)


def _uniform_teleport_supersteps(
    rel: DataFrame,
    universe: DataFrame,
    state: DataFrame,
    n: int,
    n_iter: int,
    damping: float,
) -> DataFrame:
    """Run ``n_iter`` uniform-teleport power-iteration supersteps from
    ``state`` (vertex, rank) over the static ``rel`` (src, dst, od) and
    ``universe`` (vertex, …) relations — the directed_pagerank update with
    its exact float op order (the pagerank_directed / spam_mass / warm
    oracles all replay this expression shape).  Consumes ``state`` (each
    round's predecessor checkpoint is released); the caller owns rel and
    universe."""
    base = (1.0 - damping) / n
    has_out = rel.select(F.col("src").alias("vertex")).distinct()
    for _ in range(n_iter):
        dangling = (
            state.join(has_out, "vertex", "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("d"))
            .collect()[0]["d"]
        )
        contribs = state.select(F.col("vertex").alias("src"), F.col("rank").alias("r"))
        gathered = (
            rel.join(contribs.hint("shuffle_hash"), "src")
            .groupBy(F.col("dst").alias("vertex"))
            .agg(F.sum(F.col("r") / F.col("od")).alias("inflow"))
        )
        prev = state
        state = (
            universe.join(gathered, "vertex", "left")
            .select(
                "vertex",
                (
                    F.lit(base + damping * dangling / n)
                    + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        release(prev)
    return state


def trustrank(
    edges: DataFrame,
    trusted: list[int],
    n_iter: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """(vertex, trust): TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004) — the directed_pagerank recursion with the teleport vector
    restricted to the ``trusted`` seed set (t = 1/|S| on seeds, 0 elsewhere;
    dangling mass also returns to the seeds):

        trust_{t+1}(v) = (1−d)·t(v) + d·(D_t·t(v) + Σ_{u→v} trust_t(u)/od(u))

    Trust flows OUT of the whitelist along links and decays with distance —
    pages unreachable from any trusted page end at 0.  Same plan shape as
    directed_pagerank: static (src, dst, od) relation, one co-located join
    + map-side-combined gather + 1-row dangling aggregate per superstep.
    Seeds not present in the graph contribute teleport mass that simply
    stays on them (they join the universe)."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if not trusted:
        raise ValueError("trustrank needs a non-empty trusted seed set")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rel = None
    universe = None
    try:
        e = edges.select("src", "dst").dropDuplicates(["src", "dst"])
        outdeg = e.groupBy(F.col("src").alias("u")).agg(
            F.count(F.lit(1)).alias("od")
        )
        rel = (
            e.join(outdeg, e.src == outdeg.u)
            .select("src", "dst", "od")
            .repartition(shuffle_n, "src")
            .localCheckpoint(eager=True)
        )
        seeds = sorted(set(int(v) for v in trusted))
        tele = spark.createDataFrame([(v,) for v in seeds], "vertex long").select(
            "vertex", F.lit(1.0 / len(seeds)).alias("t")
        )
        universe = (
            e.select(F.col("src").alias("vertex"))
            .unionAll(e.select(F.col("dst").alias("vertex")))
            .unionAll(tele.select("vertex"))
            .distinct()
            .join(tele, "vertex", "left")
            .select("vertex", F.coalesce("t", F.lit(0.0)).alias("t"))
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        has_out = rel.select(F.col("src").alias("vertex")).distinct()
        state = universe.select("vertex", F.col("t").alias("trust")).localCheckpoint(
            eager=True
        )
        for _ in range(n_iter):
            dangling = (
                state.join(has_out, "vertex", "left_anti")
                .agg(F.coalesce(F.sum("trust"), F.lit(0.0)).alias("d"))
                .collect()[0]["d"]
            )
            contribs = state.select(
                F.col("vertex").alias("src"), F.col("trust").alias("r")
            )
            gathered = (
                rel.join(contribs.hint("shuffle_hash"), "src")
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum(F.col("r") / F.col("od")).alias("inflow"))
            )
            prev = state
            # op order mirrored in the DuckDB oracle: (0.15·t + (0.85·D)·t)
            # + 0.85·inflow
            state = (
                universe.join(gathered, "vertex", "left")
                .select(
                    "vertex",
                    (
                        F.lit(1.0 - damping) * F.col("t")
                        + F.lit(damping * dangling) * F.col("t")
                        + F.lit(damping) * F.coalesce("inflow", F.lit(0.0))
                    ).alias("trust"),
                )
                .localCheckpoint(eager=True)
            )
            release(prev)
        return state
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in (rel, universe):
            if df is not None:
                release(df)


def spam_mass(
    edges: DataFrame,
    trusted: list[int],
    n_iter: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """(vertex, rank, trust, spam_mass): relative spam mass (Gyöngyi,
    Berkhin, Garcia-Molina & Pedersen, "Link spam detection based on mass
    estimation", VLDB 2006) — the fraction of a page's PageRank NOT
    explained by trust flowing from the whitelist:

        spam_mass(v) = (PR(v) − TR(v)) / PR(v)

    near 1 for pages ranked by link spam (rank with no trusted provenance),
    near 0 — possibly negative — for whitelist-adjacent pages.  PR from
    :func:`directed_pagerank`, TR from :func:`trustrank`, both ``n_iter``
    supersteps; rank/trust ROUND(9), spam_mass ROUND(6) (the
    pagerank_10iter float-ulp precedent).  Cost: two superstep chains +
    one join."""
    pr = directed_pagerank(edges, n_iter=n_iter, damping=damping)
    tr = trustrank(edges, trusted, n_iter=n_iter, damping=damping)
    try:
        return (
            pr.join(tr, "vertex")
            .select(
                "vertex",
                F.round("rank", 9).alias("rank"),
                F.round("trust", 9).alias("trust"),
                F.round((F.col("rank") - F.col("trust")) / F.col("rank"), 6).alias(
                    "spam_mass"
                ),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        release(pr)
        release(tr)


def warm_pagerank(
    edges: DataFrame,
    delta_edges: DataFrame,
    prior_ranks: DataFrame,
    n_iter: int = 4,
    damping: float = 0.85,
) -> DataFrame:
    """(vertex, rank): incremental PageRank — re-converge after a delta
    edge batch by warm-starting the directed power iteration from
    checkpointed ranks instead of the cold uniform vector.

    The merged graph is dedup(edges ∪ delta_edges); the init carries each
    vertex's ``prior_ranks`` value (vertices new to the graph start at the
    cold 1/n), renormalized to Σ=1, then runs ``n_iter`` of the SAME
    superstep as :func:`directed_pagerank` (shared
    ``_uniform_teleport_supersteps`` — identical float op order, so the
    chain base-PR → init → warm rounds is exactly replayable in SQL).
    Power iteration contracts the error by ×damping per step regardless of
    init, so a warm start from a nearby fixpoint needs far fewer supersteps
    than a cold restart for the same residual — the point of checkpointing
    per-superstep lineage (checkpoint.py) in the first place: a delta batch
    costs a handful of supersteps, not a full re-run.  At 100 TB the delta
    path reuses the one-exchange-per-superstep plan; only the static
    (src, dst, od) relation is rebuilt (one scan + one shuffle), and the
    prior state joins in by vertex — co-partitioned with the universe.

    ``prior_ranks`` rows for vertices no longer in the merged graph are
    ignored (dropped mass is restored by the renormalization); priors must
    be non-negative with a positive total.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    rel = None
    universe = None
    try:
        e = (
            edges.select("src", "dst")
            .unionAll(delta_edges.select("src", "dst"))
            .dropDuplicates(["src", "dst"])
        )
        outdeg = e.groupBy(F.col("src").alias("u")).agg(
            F.count(F.lit(1)).alias("od")
        )
        rel = (
            e.join(outdeg, e.src == outdeg.u)
            .select("src", "dst", "od")
            .repartition(shuffle_n, "src")
            .localCheckpoint(eager=True)
        )
        universe = (
            e.select(F.col("src").alias("vertex"))
            .unionAll(e.select(F.col("dst").alias("vertex")))
            .distinct()
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        n = universe.count()
        if n == 0:
            return spark.createDataFrame([], "vertex long, rank double")
        raw = universe.join(
            prior_ranks.select("vertex", F.col("rank").alias("__prior__")),
            "vertex",
            "left",
        ).select(
            "vertex", F.coalesce("__prior__", F.lit(1.0 / n)).alias("raw")
        )
        total = raw.agg(F.sum("raw").alias("s")).collect()[0]["s"]
        if total is None or total <= 0.0:
            raise ValueError("prior_ranks must have a positive total mass")
        state = raw.select(
            "vertex", (F.col("raw") / F.lit(total)).alias("rank")
        ).localCheckpoint(eager=True)
        return _uniform_teleport_supersteps(
            rel, universe, state, n, n_iter, damping
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in (rel, universe):
            if df is not None:
                release(df)
