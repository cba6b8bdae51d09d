"""SCAN — Structural Clustering Algorithm for Networks (Xu, Yuruk, Feng &
Schweiger, KDD 2007), made exact and cross-engine replayable.

SCAN clusters a graph by STRUCTURAL similarity instead of raw connectivity:
sigma(u, v) = |G(u) ∩ G(v)| / sqrt(|G(u)|·|G(v)|) over CLOSED neighborhoods
G(x) = N(x) ∪ {x}; an edge is eps-similar when sigma >= eps, a vertex is a
CORE when its eps-neighborhood (itself + eps-similar neighbors) has >= mu
members, clusters are the connected components of cores through eps-similar
core-core edges, non-core neighbors of cores join as BORDERS, and what
remains is classified HUB (adjacent to >= 2 distinct clusters — the
brokers) or OUTLIER (noise).  The hub/outlier split is the feature plain
connected components / label propagation cannot express — it is what makes
SCAN useful on web-scale link graphs where bridges and spam nodes must not
glue communities together.

Exactness.  eps is taken as a rational eps_num/eps_den and the similarity
test is squared into pure BIGINT arithmetic:

    sigma(u,v) >= eps  <=>  c² · eps_den² >= eps_num² · g_u · g_v,

c = |N(u) ∩ N(v)| + 2 for an existing edge (u, v) (both endpoints belong to
both closed neighborhoods), g_x = deg(x) + 1.  No sqrt, no floats — Spark
and DuckDB agree bit-for-bit, and the whole operator (including the cluster
labels = component-minimum vertex ids) is a pure function of the edge set.

Scale shape.  The only super-linear stage is the common-neighbor count,
delegated to the degree-oriented wedge kernel (`triangles.edge_support` —
O(Σ deg_oriented²) with the hub cap, shuffle rows = 3·#triangles); the
similarity filter, core test and border/hub/outlier classification are
linear joins/aggregations in one Catalyst plan, and the component stage
runs on the CORE-CORE similar subgraph only (≤ m edges, usually far
fewer), via the diameter-independent star-contraction component operator
(O(log² n) rounds, pure Catalyst).  Nothing enumerates neighborhoods per
pair and nothing collects to the driver.

Reference scope note: the C++ reference (split-merge partitioner) has no
community detection; this operator extends the analytics layer the same
way louvain.py / labelprop.py do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import canonicalize_edges
from ..storage import release
from .components import connected_components_stars
from .triangles import edge_support

# c² · eps_den² must stay < 2^63: c <= max_closed_degree, so we validate
# (maxdeg + 2) · eps_den < 2^31.5 ~ 3.03e9
_C_CAP = 3_037_000_000


def scan_clusters(
    edges: DataFrame,
    eps_num: int = 7,
    eps_den: int = 10,
    mu: int = 3,
) -> DataFrame:
    """(vertex, role, cluster) for every vertex of the canonical simple
    graph: role in {'core','border','hub','outlier'}; cluster = minimum
    vertex id of the structural cluster (-1 for hubs/outliers).  eps =
    eps_num/eps_den in (0, 1], mu >= 2 per the paper."""
    if not (0 < eps_num <= eps_den):
        raise ValueError("need 0 < eps_num <= eps_den (eps in (0,1])")
    if mu < 2:
        raise ValueError("mu must be >= 2 (mu=1 makes every vertex a core)")
    e = canonicalize_edges(edges).localCheckpoint(eager=True)
    scratch = [e]
    try:
        und = e.select(F.col("src").alias("v"), F.col("dst").alias("nb")).unionAll(
            e.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
        )
        deg = (
            und.groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("d"))
            .localCheckpoint(eager=True)
        )
        scratch.append(deg)
        maxdeg = deg.agg(F.max("d")).collect()[0][0] or 0
        if (maxdeg + 2) * eps_den >= _C_CAP:
            raise ValueError(
                f"scan_clusters: (maxdeg+2)*eps_den = {(maxdeg + 2) * eps_den} "
                f"risks int64 overflow in the squared similarity test; use a "
                f"smaller eps_den (got {eps_den})"
            )
        sup = edge_support(e)  # (src, dst, support); triangle-free edges absent
        sim = (
            e.join(sup, ["src", "dst"], "left")
            .join(deg.select(F.col("v").alias("src"), F.col("d").alias("du")), "src")
            .join(deg.select(F.col("v").alias("dst"), F.col("d").alias("dv")), "dst")
            .select(
                "src",
                "dst",
                (F.coalesce("support", F.lit(0)) + F.lit(2)).alias("c"),
                (F.col("du") + 1).alias("gu"),
                (F.col("dv") + 1).alias("gv"),
            )
            .where(
                F.col("c") * F.col("c") * F.lit(eps_den * eps_den)
                >= F.lit(eps_num * eps_num) * F.col("gu") * F.col("gv")
            )
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        scratch.append(sup)
        scratch.append(sim)
        ns = (
            sim.select(F.col("src").alias("v"))
            .unionAll(sim.select(F.col("dst").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).cast("long").alias("nsim"))
        )
        cores = (
            deg.join(ns, "v", "left")
            .where(F.coalesce("nsim", F.lit(0)) + 1 >= mu)
            .select("v")
            .localCheckpoint(eager=True)
        )
        scratch.append(cores)
        # clusters: components of cores over core-core similar edges;
        # isolated cores become singleton clusters labeled by themselves
        ce = (
            sim.join(cores.withColumnRenamed("v", "src"), "src")
            .join(cores.withColumnRenamed("v", "dst"), "dst")
            .select("src", "dst")
        )
        comp, _ = connected_components_stars(ce)
        scratch.append(comp)
        clab = cores.join(
            comp.withColumnRenamed("vertex", "v"), "v", "left"
        ).select("v", F.coalesce("component", F.col("v")).alias("cluster"))
        # borders: non-core endpoints of a similar edge whose other endpoint
        # is a clustered core — deterministic min-cluster attachment
        sim_dir = sim.select(F.col("src").alias("v"), F.col("dst").alias("u")).unionAll(
            sim.select(F.col("dst").alias("v"), F.col("src").alias("u"))
        )
        bord = (
            sim_dir.join(cores, "v", "left_anti")
            .join(clab.select(F.col("v").alias("u"), "cluster"), "u")
            .groupBy("v")
            .agg(F.min("cluster").alias("cluster"))
        )
        clustered = clab.unionByName(bord).localCheckpoint(eager=True)
        scratch.append(clustered)
        # hubs vs outliers among the unclustered: adjacent (any edge) to >= 2
        # distinct clusters -> hub, else outlier
        uncl = deg.select("v").join(clustered.select("v"), "v", "left_anti")
        nb_k = (
            uncl.join(und, "v")
            .join(clustered.select(F.col("v").alias("nb"), "cluster"), "nb")
            .groupBy("v")
            .agg(F.count_distinct("cluster").alias("k"))
        )
        is_core = cores.select("v", F.lit(True).alias("is_core"))
        out = (
            deg.select("v")
            .join(clustered, "v", "left")
            .join(is_core, "v", "left")
            .join(nb_k, "v", "left")
            .select(
                F.col("v").alias("vertex"),
                F.when(F.col("is_core"), F.lit("core"))
                .when(F.col("cluster").isNotNull(), F.lit("border"))
                .when(F.coalesce("k", F.lit(0)) >= 2, F.lit("hub"))
                .otherwise(F.lit("outlier"))
                .alias("role"),
                F.coalesce("cluster", F.lit(-1)).cast("long").alias("cluster"),
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        for df in scratch:
            release(df)
