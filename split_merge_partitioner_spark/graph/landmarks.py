"""Landmark distance sketches — the practical answer to point-to-point
distance queries on a web-scale graph, where exact APSP is impossible and
per-query BFS is too slow.

Recipe (Potamias, Bonchi, Castillo & Gionis, "Fast shortest path distance
estimation in large networks", CIKM 2009): pick k landmarks, precompute the
exact BFS distance from every landmark to every vertex ONCE (the sketch —
k·n rows), then answer any d(u, v) query with

    d̂(u, v) = min_l d(u, l) + d(l, v)

which is an UPPER bound by the triangle inequality, exact whenever some
landmark lies on a u-v shortest path.  High-degree landmarks give the best
bounds on power-law graphs (ibid. §4: hubs sit on most shortest paths), so
``select_landmarks`` takes the top-k by (degree DESC, id ASC) —
deterministic and engine-portable.

Execution:
- sketch = one batched multi-seed BFS (the closeness.py `_seed_bfs`
  machinery: all k landmarks ride ONE state relation keyed (landmark, v);
  one co-located join + distinct + anti-join per level; job count =
  eccentricity bound, NOT k).  Statics and per-level checkpoints released
  before return; only the sketch itself stays live.
- queries = two co-partitioned joins of the pairs table against the sketch
  (both keyed on a vertex column) + one min-struct aggregate — no BFS at
  query time, which is the entire point: the sketch is built once and
  amortized over millions of pair lookups.
- landmark selection is a k-row driver collect (constant-size, the
  hits.py-documented exception class).

Scale: sketch state is k·n slim rows — k is the caller's memory dial; at
100 TB you bucket-write the sketch by vertex and the query join is
shuffle-free against bucketed pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from .closeness import _seed_bfs


def select_landmarks(edges: DataFrame, k: int) -> list[int]:
    """Top-``k`` vertices by (undirected degree DESC, vertex ASC) — the
    deterministic high-degree landmark heuristic.  k-row driver collect."""
    from ..sources import degrees

    if k < 1:
        raise ValueError("k must be >= 1")
    rows = (
        degrees(edges)
        .orderBy(F.col("degree").desc(), F.col("vertex").asc())
        .limit(k)
        .collect()
    )
    return [int(r.vertex) for r in rows]


def landmark_sketch(
    edges: DataFrame,
    k: int = 8,
    max_dist: int = 32,
    landmarks: list[int] | None = None,
) -> DataFrame:
    """(vertex, landmark, dist) — exact BFS distance from each of the ``k``
    top-degree landmarks (or an explicit ``landmarks`` list) to every vertex
    within ``max_dist`` hops; includes the (l, l, 0) self rows."""
    if max_dist < 1:
        raise ValueError("max_dist must be >= 1")
    lms = landmarks if landmarks is not None else select_landmarks(edges, k)
    if not lms:
        raise ValueError("landmark set is empty")
    spark = edges.sparkSession
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    scratch: list = []
    try:
        _, visited = _seed_bfs(edges, lms, max_dist, scratch)
        return visited.select(
            F.col("v").alias("vertex"),
            F.col("seed").alias("landmark"),
            F.col("dist").cast("long").alias("dist"),
        ).localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in scratch:
            release(df)


def landmark_distances(sketch: DataFrame, pairs: DataFrame) -> DataFrame:
    """(u, v, dist_ub, via) for each row of ``pairs`` (columns u, v):
    dist_ub = min over landmarks of d(u, l) + d(l, v) — an upper bound on
    d(u, v), exact when a landmark lies on a shortest path; ``via`` = the
    landmark achieving it (smallest landmark id on ties).  Pairs where u
    and v share no landmark (different components, or horizon-truncated
    sketch) report NULLs."""
    lu = sketch.select(
        F.col("vertex").alias("u"),
        F.col("landmark").alias("l"),
        F.col("dist").alias("du"),
    )
    lv = sketch.select(
        F.col("vertex").alias("v"),
        F.col("landmark").alias("l"),
        F.col("dist").alias("dv"),
    )
    best = (
        pairs.join(lu, "u")
        .join(lv, ["v", "l"])
        .groupBy("u", "v")
        .agg(F.min(F.struct((F.col("du") + F.col("dv")).alias("t"), F.col("l"))).alias("b"))
        .select("u", "v", F.col("b.t").alias("dist_ub"), F.col("b.l").alias("via"))
    )
    return pairs.join(best, ["u", "v"], "left").select(
        "u", "v", F.col("dist_ub").cast("long").alias("dist_ub"), "via"
    )
