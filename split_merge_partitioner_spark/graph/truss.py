"""k-truss decomposition (edge-level cohesion) via support peeling.

The k-truss of an undirected graph (Cohen 2008) is the maximal subgraph in
which every edge participates in >= k-2 triangles *within the subgraph* —
the edge analog of graph/kcore.py's coreness, and a much stronger
community signal than degree (it survives hub spokes that k-core keeps).

Algorithm: iterated support peeling.  Each round recounts per-edge
triangle support with the same oriented two-join wedge enumeration as
graph/triangles.py (orient="degree" caps wedge out-degree at O(sqrt m) on
power-law hubs — the skew-killer, since a peeling round is a full
recount), drops edges with support < k-2, and stops at the fixpoint
(|E| is strictly decreasing until then, so an unchanged count IS the
fixpoint — detection costs one scalar off a relation that was being
checkpointed anyway).  ``max_rounds`` bounds the horizon; a fixpoint is
idempotent, so a fixed-horizon SQL replay (the DuckDB oracle) lands on the
identical relation whether or not the loop stopped early.

All arithmetic is integer counting — hash-exact cross-engine.  Support in
the returned relation is recomputed once on the final edge set, so it is
the within-truss support (>= k-2 at a fixpoint, by construction).

Plan shape per round: three localCheckpointed scans of the current edge
set feed the wedge self-join (two shuffles on the join keys) + one
groupBy(edge) exchange for the support count — the identical shape
Catalyst picks for triangle_count, reused unchanged at every scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

from .triangles import _oriented


def _edge_support(e_canon: DataFrame, orient: str):
    """((src, dst, sup) per canonical (src<dst) edge of ``e_canon``, scratch):
    edges in no triangle are absent (join back with a left join + coalesce 0);
    the caller must storage.release(scratch) once sup is materialized."""
    e = _oriented(e_canon, orient)
    ab = e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    bc = e.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    ac = e.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # one row per triangle
    # credit the triangle to its three edges, re-canonicalized (degree
    # orientation may have flipped them relative to src<dst)
    pairs = (
        tri.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionAll(tri.select(F.col("b").alias("u"), F.col("c").alias("v")))
        .unionAll(tri.select(F.col("a").alias("u"), F.col("c").alias("v")))
    )
    sup = (
        pairs.select(
            F.least("u", "v").alias("src"), F.greatest("u", "v").alias("dst")
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("sup"))
    )
    return sup, e


def ktruss(
    edges: DataFrame, k: int, max_rounds: int = 10, orient: str = "degree"
) -> DataFrame:
    """(src, dst, support) of the k-truss reached within ``max_rounds``
    peeling rounds over the canonical (src<dst, deduped) edge table;
    support is the within-subgraph triangle count of each surviving edge.
    k >= 3 (k-2 >= 1); k=3 keeps exactly the edges in >= 1 triangle.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (a k-truss needs support k-2 >= 1)")
    if max_rounds < 1:
        raise ValueError("max_rounds must be >= 1")
    spark = edges.sparkSession
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    n_edges = e.count()
    thresh = k - 2
    for _ in range(max_rounds):
        if n_edges == 0:
            break
        sup, scratch = _edge_support(e, orient)
        prev = e
        e = (
            prev.join(sup, ["src", "dst"], "left")
            .where(F.coalesce(F.col("sup"), F.lit(0)) >= thresh)
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        release(prev)
        release(scratch)
        n_new = e.count()
        if n_new == n_edges:  # |E| strictly decreases until the fixpoint
            break
        n_edges = n_new
    if n_edges == 0:
        release(e)
        return spark.createDataFrame([], "src long, dst long, support long")
    sup, scratch = _edge_support(e, orient)
    # materialized so the peeled edge set + oriented scratch can be released:
    # the returned checkpoint is the caller's single owned relation
    out = e.join(sup, ["src", "dst"], "left").select(
        "src", "dst", F.coalesce(F.col("sup"), F.lit(0)).cast("long").alias("support")
    ).localCheckpoint(eager=True)
    release(scratch)
    release(e)
    return out


def _trussness_dense(spark, e_canon: DataFrame, max_rounds: int):
    rows = e_canon.toPandas()
    live = {(int(u), int(v)) for u, v in zip(rows["src"], rows["dst"])}
    adj: dict[int, set[int]] = {}
    for u, v in live:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    t, rounds = 2, 0
    out = []
    while live:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"trussness peel did not finish in {max_rounds} rounds")
        sup = {
            (u, v): len(adj[u] & adj[v])
            for (u, v) in live
        }
        t = max(t, min(sup.values()) + 2)
        rm = [p for p, s in sup.items() if s <= t - 2]
        for u, v in rm:
            live.discard((u, v))
            adj[u].discard(v)
            adj[v].discard(u)
            out.append((u, v, t))
    df = spark.createDataFrame(out, "src long, dst long, trussness long")
    return df, {"rounds": rounds, "mode": "dense"}


def _trussness_shuffle(spark, e_canon: DataFrame, max_rounds: int, orient: str):
    live = e_canon.localCheckpoint(eager=True)
    t, rounds = 2, 0
    layers: list[DataFrame] = []
    try:
        while True:
            m = live.count()
            if m == 0:
                break
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"trussness peel did not finish in {max_rounds} rounds"
                )
            sup_pos, scratch = _edge_support(live, orient)
            sup = (
                live.join(sup_pos, ["src", "dst"], "left")
                .select("src", "dst", F.coalesce("sup", F.lit(0)).alias("sup"))
                .localCheckpoint(eager=True)
            )
            release(scratch)
            mn = sup.agg(F.min("sup")).collect()[0][0]  # constant scalar
            t = max(t, int(mn) + 2)
            rm = sup.where(F.col("sup") <= t - 2)
            layers.append(
                rm.select(
                    "src", "dst", F.lit(t).cast("long").alias("trussness")
                ).localCheckpoint(eager=True)
            )
            new_live = live.join(
                rm.select("src", "dst"), ["src", "dst"], "left_anti"
            ).localCheckpoint(eager=True)
            release(live)
            release(sup)
            live = new_live
    finally:
        release(live)
    if not layers:
        out = spark.createDataFrame([], "src long, dst long, trussness long")
    else:
        out = layers[0]
        for df in layers[1:]:
            out = out.unionAll(df)
    return out, {"rounds": rounds, "mode": "shuffle"}


def truss_decomposition(
    edges: DataFrame,
    max_rounds: int = 100_000,
    orient: str = "degree",
    dense_threshold: int = 2_000_000,
) -> tuple[DataFrame, dict]:
    """((src, dst, trussness) DataFrame, info): the FULL truss number of
    every canonical edge — the maximum k such that the edge survives in
    the k-truss — via monotone support peeling (the onion.py batching
    applied to ktruss's per-round recount: with t the current truss level,
    every round removes ALL edges of within-subgraph support <= t-2 and t
    rises to min support + 2 when the minimum clears it).  Rounds scale
    with the truss width (~32 on the fixtures), not edge count.

    Equivalent to running ktruss() at every k, collapsed into one pass:
    ktruss(edges, k) == edges with trussness >= k (cross-checked in
    tests).  Dual path per kcore.py/onion.py: the driver-dense peel below
    ``dense_threshold`` edges, else the distributed per-round recount
    (degree-oriented wedge join, one scalar collect per round, per-round
    relations localCheckpointed + released, assignments unioned
    lineage-free)."""
    spark = edges.sparkSession
    e_canon = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    m = e_canon.count()
    if m == 0:
        out = spark.createDataFrame([], "src long, dst long, trussness long")
        return out, {"rounds": 0, "mode": "empty"}
    if m <= dense_threshold:
        return _trussness_dense(spark, e_canon, max_rounds)
    return _trussness_shuffle(spark, e_canon, max_rounds, orient)
