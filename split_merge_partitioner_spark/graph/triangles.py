"""Exact triangle counting.

Canonical oriented edges (src < dst, deduped) make every triangle a<b<c appear
exactly once as the wedge (a,b),(b,c) closed by (a,c) — two self-joins, fully
Catalyst-planned (and SQL-expressible, so the DuckDB oracle covers it).

For skew (hub wedge explosion) at scale: orient by DEGREE instead of id
(lower-degree vertex first) before the wedge join — the standard
wedge-count-minimizing trick; exposed via orient="degree".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import degrees as degrees_of
from ..storage import release


def _oriented(edges: DataFrame, orient: str) -> DataFrame:
    if orient == "id":
        # already canonical src<dst; materialized for the same 3-leg reuse
        return edges.select("src", "dst").localCheckpoint(eager=True)
    # persist (not localCheckpoint): the broadcast build below materializes
    # the cache — one setup job instead of an eager checkpoint plus the build
    deg_ckpt = degrees_of(edges).persist()
    deg = F.broadcast(deg_ckpt)
    e = (
        edges.join(deg.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "ds"), "src")
        .join(deg.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "dd"), "dst")
    )
    first = (F.col("ds") < F.col("dd")) | ((F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst")))
    oriented = e.select(
        F.when(first, F.col("src")).otherwise(F.col("dst")).alias("src"),
        F.when(first, F.col("dst")).otherwise(F.col("src")).alias("dst"),
    )
    # materialize: the wedge query self-joins this THREE times; without a cut
    # the whole degree-join subplan executes once per leg (seen in
    # explain("formatted") — three repeated BroadcastHashJoin blocks)
    out = oriented.localCheckpoint(eager=True)
    release(deg_ckpt)  # folded into the oriented checkpoint; scratch otherwise
    return out


def triangle_count(edges: DataFrame, orient: str = "degree") -> int:
    """Degree orientation is the default: the wedge count is sum of squared
    OUT-degrees, and orienting low-degree -> high-degree caps out-degree at
    O(sqrt(m)) even on power-law hubs — the skew-killer at scale.  The count
    itself is orientation-invariant (oracle stays on id orientation)."""
    e = _oriented(edges, orient)
    try:
        ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
        ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
        wedges = ab.join(bc, "b")
        return wedges.join(ac, ["a", "c"]).count()
    finally:
        release(e)


def triangles_per_vertex(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """(vertex, triangles) — each closed triangle credited to all 3 corners
    (corner credits are orientation-invariant: every triangle appears exactly
    once under any acyclic orientation)."""
    e = _oriented(edges, orient)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # rows (a, b, c), a<b<c
    corners = (
        tri.select(F.col("a").alias("vertex"))
        .unionAll(tri.select(F.col("b").alias("vertex")))
        .unionAll(tri.select(F.col("c").alias("vertex")))
    )
    # materialize (n-row result << wedge work) so the oriented scratch can be
    # released here instead of staying pinned under a lazy result plan
    out = corners.groupBy("vertex").agg(
        F.count(F.lit(1)).alias("triangles")
    ).localCheckpoint(eager=True)
    release(e)
    return out


def local_clustering(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """(vertex, degree, triangles, lcc) — the local clustering coefficient
    lcc(v) = 2*tri(v) / (deg(v)*(deg(v)-1)), 0 for degree-1 vertices.
    Composition of the per-vertex triangle counts and the degree table
    (left join: triangle-free vertices count 0), rounded to 6 for the
    cross-engine oracle."""
    from ..sources.edges import degrees

    tri = triangles_per_vertex(edges, orient=orient)
    deg = degrees(edges)
    t = F.coalesce(F.col("triangles"), F.lit(0)).cast("long")
    d = F.col("degree").cast("double")
    lcc = F.when(
        F.col("degree") >= 2, F.round(2.0 * t / (d * (d - 1.0)), 6)
    ).otherwise(F.lit(0.0))
    return deg.join(tri, "vertex", "left").select(
        "vertex", "degree", t.alias("triangles"), lcc.alias("lcc")
    )


def triangle_count_sampled(
    edges: DataFrame,
    p: int = 3,
    seed: int = 42,
    orient: str = "degree",
) -> DataFrame:
    """Doulion sampled triangle estimate (Tsourakakis et al., KDD 2009):
    keep each edge with probability 1/``p`` and scale the exact sample
    count by p³.  One row: (p, n_edges_sampled, tri_sampled, estimate).

    This is the 100-TB approximate path: sparsifying FIRST cuts the wedge
    join's shuffle volume by ~p² (wedges scale with the square of degree)
    while the estimator stays unbiased with variance ~1/p³ of the count —
    on graphs where even the degree-oriented exact kernel's O(m^1.5) is
    too much, p=10 buys a 100× cheaper plan for a few percent error.

    Determinism contract (the sampling.py discipline): the coin flip is
    the Lehmer hash of src·1000003 + dst — a pure function of the edge, so
    the SAME subgraph is selected under any partitioning/retry/cluster
    size and the DuckDB oracle replays it bit-exactly.  The key mix is not
    injective at extreme id ranges; a collision only correlates two edges'
    coin flips, which perturbs variance, not unbiasedness.  estimate =
    tri_sampled · p³ stays exact BIGINT (no float anywhere).
    """
    if p < 1:
        raise ValueError("p must be >= 1")
    from ..functions.sampling import M31, sample_hash

    keyed = edges.withColumn(
        "__ekey__", F.col("src").cast("long") * F.lit(1000003) + F.col("dst").cast("long")
    )
    sampled = keyed.where(sample_hash("__ekey__", seed) < F.lit(M31 // p)).select(
        "src", "dst"
    )
    e = _oriented(sampled, orient)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])
    spark = edges.sparkSession
    n_sampled = sampled.count()
    tri_sampled = tri.count()
    release(e)
    return spark.createDataFrame(
        [(int(p), int(n_sampled), int(tri_sampled), int(tri_sampled) * int(p) ** 3)],
        "p long, n_edges_sampled long, tri_sampled long, estimate long",
    )


def kclique_count(edges: DataFrame, k: int = 4, orient: str = "degree") -> int:
    """Exact count of k-cliques (k >= 2; k=3 reproduces triangle_count).

    Ordered-enumeration on the acyclic orientation: every k-clique appears
    exactly once as the tuple (v1 < v2 < ... < vk) in orientation order with
    all C(k,2) oriented edges present.  The relation of ordered t-cliques is
    extended one vertex at a time — join the oriented edge list on the LAST
    clique vertex to propose candidates, then inner-join the remaining t-1
    edge checks (each a co-partitioned hash join on the same checkpointed
    relation).  Cliques-so-far shrink geometrically in t on sparse graphs, so
    the dominant cost stays the triangle-level wedge join; degree orientation
    caps the per-vertex fan-out at O(sqrt(m)) exactly as in triangle_count.

    At 100 TB scale this is the plan you want: no adjacency-set UDF, no
    driver-side state — k-1 self-joins the optimizer can reorder, with the
    candidate-generation join always on the smallest relation (the ordered
    (t)-cliques).  The count is orientation-invariant, so the DuckDB oracle
    replays it on plain id order.
    """
    if k < 2:
        raise ValueError("kclique_count needs k >= 2")
    e = _oriented(edges, orient)
    try:
        if k == 2:
            return e.count()
        r = e.select(F.col("src").alias("v1"), F.col("dst").alias("v2"))
        for t in range(2, k):
            ext = r.join(
                e.select(F.col("src").alias(f"v{t}"), F.col("dst").alias("cand")),
                f"v{t}",
            )
            for i in range(1, t):
                ext = ext.join(
                    e.select(F.col("src").alias(f"v{i}"), F.col("dst").alias("cand")),
                    [f"v{i}", "cand"],
                )
            r = ext.withColumnRenamed("cand", f"v{t + 1}")
        return r.count()
    finally:
        release(e)


def square_count(
    edges: DataFrame, max_center_degree: int | None = None
) -> DataFrame:
    """Exact count of (not-necessarily-induced) 4-cycles in the undirected
    graph, one row: (n_squares,).

    Codegree identity: every 4-cycle u-a-v-b has exactly TWO diagonal pairs
    ({u,v} and {a,b}), and a pair {x,y} with c common neighbors closes
    C(c,2) cycles through its diagonal — so n_squares = (1/2) * Σ_{x<y}
    C(codeg(x,y), 2), all BIGINT (the sum is always even).  This is the
    unipartite twin of butterflies.py (there the two diagonal pairs live on
    opposite sides, so no halving).

    Scale shape: codegrees come from ONE wedge self-join on the doubled
    adjacency grouped by endpoint pair — the exchange carries one row per
    CO-NEIGHBOR PAIR (map-side combined), never per wedge.  Wedge volume is
    Σ_w C(deg(w), 2); for hub-heavy graphs pass ``max_center_degree`` to
    drop hub centers from enumeration (documented undercount — the
    butterflies.py / linkpred.py cap contract).  Unlike the triangle
    kernel, degree orientation cannot cap this one: a wedge's center is
    fixed by the motif, not choosable — the cap is the honest knob.
    """
    und = edges.select(F.col("src").alias("w"), F.col("dst").alias("u")).unionAll(
        edges.select(F.col("dst").alias("w"), F.col("src").alias("u"))
    )
    if max_center_degree is not None:
        keep = (
            und.groupBy("w")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") <= max_center_degree)
            .select("w")
        )
        und = und.join(keep, "w")
    lft = und.select("w", F.col("u").alias("a"))
    rgt = und.select("w", F.col("u").alias("b"))
    pc = (
        lft.join(rgt, "w")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    # integer end-to-end: C(c,2) via div (no double division on the surface)
    return pc.agg(
        F.coalesce(
            F.expr("sum((c * (c - 1)) div 2) div 2").cast("long"),
            F.lit(0).cast("long"),
        ).alias("n_squares")
    )


def edge_support(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """(src, dst, support): for every canonical edge, the number of
    triangles containing it (= |N(src) ∩ N(dst)|, the edge's
    EMBEDDEDNESS — Granovetter-style tie strength; support < k-2 is
    exactly what ktruss peels on).  Edges in no triangle are omitted
    (implicit support 0 — the result is triangle-sparse by nature).

    Same O(Sigma deg_oriented^2) wedge join as triangle_count (degree
    orientation caps hub wedges); each enumerated triangle a<b<c emits
    its 3 canonical edges, one groupBy(edge) with map-side combine —
    shuffle rows = 3 * #triangles, never #wedges."""
    o = _oriented(edges, orient)
    ab = o.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = o.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = o.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tris = ab.join(bc, "b").join(ac, ["a", "c"])
    es = (
        tris.select(F.col("a").alias("x"), F.col("b").alias("y"))
        .unionAll(tris.select(F.col("b"), F.col("c")))
        .unionAll(tris.select(F.col("a"), F.col("c")))
    )
    # materialize (edge-sparse result << wedge work) so the orientation
    # scratch releases here instead of pinning under the lazy result —
    # the triangles_per_vertex discipline
    out = (
        es.select(F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("support"))
        .localCheckpoint(eager=True)
    )
    release(o)
    return out


def triangle_delta(edges: DataFrame, delta_edges: DataFrame) -> DataFrame:
    """One row (new_edges, t1, t2, t3, delta_triangles): incremental
    triangle maintenance — how many triangles a delta edge batch ADDS,
    classified by how many of each new triangle's edges are new (t1/t2/t3),
    without recounting the base graph.

    Both inputs are canonicalized (least<greatest, dedup, self-loops
    dropped); delta edges already present in the base are ignored
    (new_edges counts the survivors).  Inclusion–exclusion over the three
    delta-proportional counts

        S1 = Σ_{(u,v)∈D} |N_M(u) ∩ N_M(v)|   (counts t1 + 2·t2 + 3·t3)
        S2 = #{delta wedge closed by a merged edge}  (counts t2 + 3·t3)
        S3 = #{triangles with all 3 edges in D}

    gives delta_triangles = S1 − S2 + S3 (and t3 = S3, t2 = S2 − 3·S3,
    t1 = S1 − 2·S2 + 3·S3).  The caller adds delta_triangles to its
    checkpointed total — count maintenance as a delta-proportional job:
    S1 probes the merged adjacency with |D| edges (two co-partitioned
    joins, never a full wedge enumeration), S2/S3 are |D|-sized wedge
    joins.  The oracle replays it INDEPENDENTLY: enumerate merged
    triangles, classify by per-triangle new-edge count, group by k.
    """
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _canon(df: DataFrame) -> DataFrame:
        return (
            df.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    base = _canon(edges).localCheckpoint(eager=True)
    scratch = [base]
    try:
        d = (
            _canon(delta_edges)
            .join(base, ["src", "dst"], "left_anti")
            .localCheckpoint(eager=True)
        )
        scratch.append(d)
        n_new = d.count()
        merged = base.unionAll(d)
        adj = (
            merged.select(F.col("src").alias("u"), F.col("dst").alias("w"))
            .unionAll(merged.select(F.col("dst").alias("u"), F.col("src").alias("w")))
            .repartition(shuffle_n, "u")
            .localCheckpoint(eager=True)
        )
        scratch.append(adj)
        # S1: common neighbors of each delta edge's endpoints in merged
        s1 = (
            d.join(adj.select(F.col("u").alias("src"), "w"), "src")
            .join(adj.select(F.col("u").alias("dst"), "w"), ["dst", "w"])
            .count()
        )
        # S2: delta wedges (two new edges sharing a center, endpoints
        # ordered) whose closing edge exists in the merged graph
        dd = d.select(F.col("src").alias("u"), F.col("dst").alias("w")).unionAll(
            d.select(F.col("dst").alias("u"), F.col("src").alias("w"))
        )
        wedges = (
            dd.select("u", F.col("w").alias("w1"))
            .join(dd.select("u", F.col("w").alias("w2")), "u")
            .where(F.col("w1") < F.col("w2"))
        )
        s2 = wedges.join(
            merged.select(F.col("src").alias("w1"), F.col("dst").alias("w2")),
            ["w1", "w2"],
        ).count()
        # S3: triangles entirely inside the delta batch (id orientation —
        # the delta is canonical already)
        s3 = triangle_count(d, orient="id")
        t3 = s3
        t2 = s2 - 3 * s3
        t1 = s1 - 2 * s2 + 3 * s3
        return spark.createDataFrame(
            [(n_new, t1, t2, t3, t1 + t2 + t3)],
            "new_edges bigint, t1 bigint, t2 bigint, t3 bigint, delta_triangles bigint",
        )
    finally:
        for df in scratch:
            release(df)
