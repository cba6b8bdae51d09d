"""Deterministic random-walk corpus generation — the node2vec/DeepWalk-style
sequence generator a link-graph training pipeline feeds to embedding models
(walk sequences are the "documents" of graph skip-gram training).

Semantics: ``walks_per_vertex`` walks of ``walk_length`` steps start at every
vertex of the undirected canonical graph.  At each step the walker at vertex
v moves to neighbor number ``(h & (2^63-1)) % deg(v)`` of v's neighbor list
sorted ascending by neighbor id, where h is a per-(start, walk, step)
splitmix64 hash chain:

    h_0 = sm64(sm64(start + seed) + walk)        (uint64 wraparound adds)
    h_t = sm64(h_{t-1})

Everything is a pure function of (edges, seed) — no RNG state, no sampling
nondeterminism — so the DuckDB oracle replays the whole corpus bit-for-bit
(the hyperanf.py splitmix64/HUGEINT recipe) and re-runs are identical for
checkpoint/resume.

Execution (pure JVM loop):
- static input: the neighbor list indexed ONCE — (w, idx, n, deg_n) with
  idx = dense rank of n within w's ascending neighbor list and deg_n the
  NEIGHBOR's degree (carrying it here is what keeps the step to a single
  join: the post-step state needs the new vertex's degree and gets it from
  the adjacency row itself) — hash-partitioned by the join key (w, idx) and
  localCheckpointed, so it never re-exchanges.
- per step, ONE shuffle: the walker state (start, walk, cur, deg_cur, h)
  computes j = (h & MASK63) % deg_cur and joins the static adjacency on
  (cur, j) = (w, idx); splitmix64 is four wrapping BIGINT expressions
  inside whole-stage codegen (spark.sql.ansi.enabled is flipped off for the
  loop and restored — Java wraparound IS uint64 mod-2^64 arithmetic,
  bit-verified against the NumPy reference in tests).
- state is localCheckpointed per step (constant-size plans, no lineage
  growth); the result is the union of per-step projections of those
  materialized states, so total storage is one copy of the output —
  n·walks_per_vertex·(walk_length+1) rows, the same order as the corpus a
  caller would write to parquet anyway.

Scale: state rows = n·walks_per_vertex regardless of step; each step's
shuffle moves exactly that many slim rows.  Hub vertices cost nothing extra
(the walker indexes into the hub's list; it never materializes it), so no
skew handling is needed beyond the adjacency build's window.

Reference basis: DeepWalk (Perozzi 2014) / node2vec (Grover 2016) uniform
walks; determinism-by-hash follows the hyperanf.py oracle discipline.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..storage import release

_MASK63 = (1 << 63) - 1


def _i64(u: int) -> int:
    """uint64 constant -> the signed two's-complement BIGINT literal."""
    return int(np.int64(np.uint64(u)))


_C1 = _i64(0x9E3779B97F4A7C15)
_C2 = _i64(0xBF58476D1CE4E5B9)
_C3 = _i64(0x94D049BB133111EB)


def _sm64(col):
    """splitmix64 finalizer as wrapping BIGINT Catalyst expressions
    (requires spark.sql.ansi.enabled=false for Java wraparound; bit-exact
    vs hyperanf.splitmix64 — tested)."""
    z = col + F.lit(_C1)
    z = (z.bitwiseXOR(F.shiftrightunsigned(z, 30))) * F.lit(_C2)
    z = (z.bitwiseXOR(F.shiftrightunsigned(z, 27))) * F.lit(_C3)
    return z.bitwiseXOR(F.shiftrightunsigned(z, 31))


def random_walks(
    edges: DataFrame,
    walk_length: int = 16,
    walks_per_vertex: int = 2,
    seed: int = 42,
    assume_canonical: bool = False,
) -> DataFrame:
    """(start, walk, step, vertex) — the deterministic uniform-walk corpus
    (module docstring).  step runs 0..walk_length with step 0 = start.

    assume_canonical: the neighbor indexing requires canonical deduped
    src<dst edges; by default the input is canonicalized here (one extra
    shuffle) — pass True when the input is known-canonical."""
    spark = edges.sparkSession
    if not assume_canonical:
        edges = (
            edges.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    adj = None
    steps: list[DataFrame] = []
    try:
        und = edges.select(F.col("src").alias("w"), F.col("dst").alias("n")).unionAll(
            edges.select(F.col("dst").alias("w"), F.col("src").alias("n"))
        )
        deg = und.groupBy("w").agg(F.count(F.lit(1)).alias("degree"))
        # static indexed adjacency carrying the NEIGHBOR's degree (docstring)
        wdw = Window.partitionBy("w").orderBy("n")
        adj = (
            # idx cast to LONG so the static hash partitioning satisfies the
            # (cur: long, j: long) join requirement — an int idx would be
            # wrapped in cast() at the join and force a per-step re-exchange
            und.withColumn("idx", (F.row_number().over(wdw) - F.lit(1)).cast("long"))
            .join(
                deg.select(F.col("w").alias("n"), F.col("degree").alias("deg_n")), "n"
            )
            .select("w", "idx", "n", "deg_n")
            .repartition(shuffle_n, "w", "idx")
            .localCheckpoint(eager=True)
        )
        state = (
            deg.select(F.col("w").alias("start"), F.col("degree").alias("deg_cur"))
            .withColumn(
                "walk", F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1)))
            )
            .select(
                "start",
                F.col("walk").cast("long").alias("walk"),
                F.col("start").alias("vertex"),
                "deg_cur",
                _sm64(_sm64(F.col("start") + F.lit(seed)) + F.col("walk")).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        steps.append(state)
        for _ in range(walk_length):
            prev = steps[-1]
            j = (F.col("h").bitwiseAND(F.lit(_MASK63)) % F.col("deg_cur")).alias("j")
            moved = (
                prev.select("start", "walk", F.col("vertex").alias("cur"), j, _sm64(F.col("h")).alias("h"))
                .hint("shuffle_hash")
                .join(adj, (F.col("cur") == F.col("w")) & (F.col("j") == F.col("idx")))
                .select(
                    "start",
                    "walk",
                    F.col("n").alias("vertex"),
                    F.col("deg_n").alias("deg_cur"),
                    "h",
                )
                .localCheckpoint(eager=True)
            )
            steps.append(moved)
        out = None
        for t, st in enumerate(steps):
            proj = st.select(
                "start", "walk", F.lit(t).cast("long").alias("step"), "vertex"
            )
            out = proj if out is None else out.unionAll(proj)
        # materialize the corpus into ONE checkpoint so every per-step state
        # (and the static adjacency) can be released here rather than leaking
        # in executor storage for the session's lifetime; transiently 2× the
        # corpus, permanently 1× — the caller owns (and can unpersist) `out`
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if adj is not None:
            release(adj)
        for st in steps:
            release(st)


def node2vec_walks(
    edges: DataFrame,
    walk_length: int = 8,
    walks_per_vertex: int = 1,
    seed: int = 42,
    w_return: int = 1,
    w_common: int = 1,
    w_explore: int = 1,
    assume_canonical: bool = False,
) -> DataFrame:
    """(start, walk, step, vertex) — the SECOND-ORDER biased walk corpus
    (node2vec, Grover & Leskovec 2016), derandomized with the same
    splitmix64 chain as random_walks so the whole corpus is a pure
    function of (edges, seed) and replays bit-for-bit cross-engine.

    Bias is expressed as INTEGER weights over the classic three classes of
    the walker's (prev -> cur) transition: candidate neighbor n of cur
    gets w_return if n = prev (node2vec 1/p), w_common if {prev, n} is an
    edge (distance 1), else w_explore (1/q).  Choose integers
    proportional to 1/p : 1 : 1/q (e.g. p=2, q=0.5 -> 1:2:4).  The draw
    is (h & 2^63-1) mod total_weight mapped onto the cumulative-weight
    intervals of cur's neighbors in ascending-id order; with all weights
    equal this is EXACTLY random_walks' index pick, which is also how the
    first hop (no prev yet) always draws.

    Execution & honest cost model: uniform walks index into the adjacency
    (hubs never materialize), but a second-order step must CLASSIFY every
    neighbor of cur against prev, so each step materializes
    Sigma_{walkers} deg(cur) candidate rows — the irreducible cost of
    exact node2vec (the alias-table alternative precomputes per-(prev,cur)
    distributions: O(Sigma deg(u)·deg(v)) space, rejected).  Three
    exchanges per step: candidates keyed by cur (static adjacency stays
    co-partitioned), the {prev, n} edge-existence probe keyed by the pair,
    and the per-walker cumulative-weight window.  State between steps
    stays n·walks_per_vertex rows.  Power-law hubs dominate the candidate
    volume; cap walk fan-in upstream (or run random_walks) when
    deg_max · walkers_per_step is the binding constraint.
    """
    if min(w_return, w_common, w_explore) < 1:
        raise ValueError("bias weights must be positive integers")
    spark = edges.sparkSession
    if not assume_canonical:
        edges = (
            edges.select(
                F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
        )
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    adj = None
    und2 = None
    steps: list[DataFrame] = []
    try:
        und = edges.select(F.col("src").alias("w"), F.col("dst").alias("n")).unionAll(
            edges.select(F.col("dst").alias("w"), F.col("src").alias("n"))
        )
        deg = und.groupBy("w").agg(F.count(F.lit(1)).alias("degree"))
        wdw = Window.partitionBy("w").orderBy("n")
        adj = (
            und.withColumn("idx", (F.row_number().over(wdw) - F.lit(1)).cast("long"))
            .select("w", "idx", "n")
            .repartition(shuffle_n, "w")
            .localCheckpoint(eager=True)
        )
        # the {prev, n} existence probe relation (both orientations)
        und2 = (
            und.select(F.col("w").alias("pa"), F.col("n").alias("pb"))
            .repartition(shuffle_n, "pa", "pb")
            .localCheckpoint(eager=True)
        )
        state = (
            deg.select(F.col("w").alias("start"), F.col("degree").alias("deg_cur"))
            .withColumn(
                "walk", F.explode(F.sequence(F.lit(0), F.lit(walks_per_vertex - 1)))
            )
            .select(
                "start",
                F.col("walk").cast("long").alias("walk"),
                F.lit(None).cast("long").alias("prev"),
                F.col("start").alias("vertex"),
                "deg_cur",
                _sm64(_sm64(F.col("start") + F.lit(seed)) + F.col("walk")).alias("h"),
            )
            .localCheckpoint(eager=True)
        )
        steps.append(state)
        for t in range(walk_length):
            prev_st = steps[-1]
            if t == 0:
                # first hop: no prev — the uniform index pick (cheap path)
                j = (F.col("h").bitwiseAND(F.lit(_MASK63)) % F.col("deg_cur")).alias("j")
                moved = (
                    prev_st.select(
                        "start", "walk", F.col("vertex").alias("cur"), j,
                        _sm64(F.col("h")).alias("h"),
                    )
                    .hint("shuffle_hash")
                    .join(adj, (F.col("cur") == F.col("w")) & (F.col("j") == F.col("idx")))
                    .select(
                        "start", "walk",
                        F.col("cur").alias("prev"),
                        F.col("n").alias("vertex"),
                        "h",
                    )
                )
            else:
                cand = (
                    prev_st.select(
                        "start", "walk", "prev", F.col("vertex").alias("cur"), "h"
                    )
                    .hint("shuffle_hash")
                    .join(adj, F.col("cur") == F.col("w"))
                    .select("start", "walk", "prev", "cur", "n", "h")
                )
                marked = cand.join(
                    und2.withColumn("__adj__", F.lit(1)),
                    (F.col("prev") == F.col("pa")) & (F.col("n") == F.col("pb")),
                    "left",
                ).select(
                    "start", "walk", "prev", "cur", "n", "h",
                    F.when(F.col("n") == F.col("prev"), F.lit(w_return))
                    .when(F.col("__adj__").isNotNull(), F.lit(w_common))
                    .otherwise(F.lit(w_explore))
                    .cast("long")
                    .alias("bw"),
                )
                wwin = Window.partitionBy("start", "walk")
                worder = wwin.orderBy("n").rowsBetween(Window.unboundedPreceding, 0)
                scored = marked.select(
                    "start", "walk", "cur", "n", "h",
                    F.sum("bw").over(worder).alias("cumw"),
                    F.col("bw"),
                    F.sum("bw").over(wwin).alias("total"),
                )
                draw = F.col("h").bitwiseAND(F.lit(_MASK63)) % F.col("total")
                moved = scored.where(
                    (draw >= F.col("cumw") - F.col("bw")) & (draw < F.col("cumw"))
                ).select(
                    "start", "walk",
                    F.col("cur").alias("prev"),
                    F.col("n").alias("vertex"),
                    _sm64(F.col("h")).alias("h"),
                )
            moved = moved.localCheckpoint(eager=True)
            steps.append(moved)
        out = None
        for t, st in enumerate(steps):
            proj = st.select(
                "start", "walk", F.lit(t).cast("long").alias("step"), "vertex"
            )
            out = proj if out is None else out.unionAll(proj)
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in (adj, und2):
            if df is not None:
                release(df)
        for st in steps:
            release(st)


def walk_topk_recs(
    edges: DataFrame,
    k: int = 5,
    walk_length: int = 16,
    walks_per_vertex: int = 2,
    seed: int = 42,
    assume_canonical: bool = False,
) -> DataFrame:
    """(start, rec, n_visits, rnk) — Pixie-style random-walk
    recommendations (Eksombatchai et al., "Pixie: a system for
    recommending 3+ billion items...", WWW 2018): for each start vertex,
    the top-``k`` OTHER vertices by visit count across its deterministic
    walks, ties broken by ascending vertex id (engine-portable ranking).

    Visit counts inherit the corpus determinism (pure function of
    (edges, seed)), so the full recommendation table is exact-integer and
    cross-engine replayable — the property production systems give up when
    they sample online; here re-serving a request is free re-derivation.

    Plan: the corpus (one exchange per step) + one map-side-combined
    groupBy(start, vertex) + one window over start partitions (each
    bounded by the vertices the walks actually visited — ≤ W·L rows per
    start, so the window never sees a hub-sized partition).
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    corpus = random_walks(
        edges,
        walk_length=walk_length,
        walks_per_vertex=walks_per_vertex,
        seed=seed,
        assume_canonical=assume_canonical,
    )
    try:
        from pyspark.sql import Window

        counts = (
            corpus.where((F.col("step") >= 1) & (F.col("vertex") != F.col("start")))
            .groupBy("start", F.col("vertex").alias("rec"))
            .agg(F.count(F.lit(1)).cast("long").alias("n_visits"))
        )
        w = Window.partitionBy("start").orderBy(
            F.col("n_visits").desc(), F.col("rec").asc()
        )
        return (
            counts.select(
                "start", "rec", "n_visits", F.row_number().over(w).alias("rnk")
            )
            .where(F.col("rnk") <= k)
            .select("start", "rec", "n_visits", F.col("rnk").cast("long").alias("rnk"))
            .localCheckpoint(eager=True)
        )
    finally:
        release(corpus)
