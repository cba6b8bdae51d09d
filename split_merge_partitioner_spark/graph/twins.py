"""Structural twin detection — vertices with IDENTICAL neighborhoods.

Open twins (a.k.a. false twins) share the open neighborhood, N(u) = N(v);
closed twins (true twins) share the closed one, N[u] = N[v] (so closed twins
are always adjacent).  Twin classes are the standard mirror/bot-farm signal
on a link graph (accounts wired to exactly the same targets), the modular-
decomposition base case, and a lossless graph-compression move (a twin class
collapses to one representative + a multiplicity).

Semantics: EXACT set equality, not hash equality.  Output keeps only
vertices that belong to a class of size >= 2:

    (vertex BIGINT, twin_id BIGINT, twin_size BIGINT)

with ``twin_id`` = the smallest vertex id in the class (deterministic,
engine-portable label).

Execution (two-stage, the reason this scales):

1. **Signature prefilter** — per vertex, ``(degree, wrapping-sum of
   splitmix64(neighbor))`` via one map-side-combined exchange (the wl.py
   multiset-hash idiom, ANSI flipped off for Java uint64 wraparound and
   restored).  Classes are candidate-pruned on the signature: equal
   neighbor sets imply equal signatures, so the prefilter has NO false
   negatives — hash collisions can only ADD candidates, which stage 2
   removes.  Exactness therefore never depends on the hash.
2. **Exact confirm** — only vertices whose signature class has >= 2 members
   materialize their sorted neighbor array (``sort_array(collect_list)``)
   and group on it.  On a power-law graph virtually every hub has a unique
   signature, so hub-sized arrays never materialize unless two hubs really
   are twins — the array stage sees only the (tiny) candidate set.

``max_degree`` optionally caps stage 2 (result = twins among vertices of
degree <= cap) for adversarial inputs where enormous candidate classes of
high degree exist; default None = exact over all vertices.

Scale: stage 1 is one exchange over 2m slim rows + one over n; stage 2
touches only candidate vertices.  No driver-side state, no iteration.

Reference basis: modular decomposition / twin reduction folklore (see e.g.
Habib & Paul, "A survey of the algorithmic aspects of modular
decomposition", 2010); the signature-then-confirm shape is ours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from .walks import _sm64


def structural_twins(
    edges: DataFrame, closed: bool = False, max_degree: int | None = None
) -> DataFrame:
    """(vertex, twin_id, twin_size) for every vertex in an open- (default)
    or closed-neighborhood twin class of size >= 2 of the undirected
    simple graph; ``twin_id`` = min vertex id of the class."""
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    cand_v = None
    try:
        und = (
            edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
            .unionAll(edges.select(F.col("dst").alias("v"), F.col("src").alias("u")))
            .where(F.col("v") != F.col("u"))  # self-loops never affect set equality
            .distinct()  # set semantics even if the input repeats edges
        )
        if closed:
            und = und.unionAll(
                und.select("v").distinct().select("v", F.col("v").alias("u"))
            )
        # stage 1: (degree, wrapping multiset hash) signature, one combined
        # exchange; candidate classes = signatures seen >= 2 times
        sig = und.groupBy("v").agg(
            F.count(F.lit(1)).alias("deg"), F.sum(_sm64(F.col("u"))).alias("s")
        )
        if max_degree is not None:
            sig = sig.where(F.col("deg") <= F.lit(int(max_degree)))
        cand_cls = (
            sig.groupBy("deg", "s")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .where(F.col("cnt") >= 2)
            .drop("cnt")
        )
        # materialize the candidate vertex list while ANSI is still off (the
        # lazy _sm64 lineage would overflow-throw after restore otherwise)
        cand_v = (
            sig.join(cand_cls.hint("shuffle_hash"), ["deg", "s"])
            .select("v")
            .localCheckpoint(eager=True)
        )
        # stage 2: exact sorted-neighbor-array grouping, candidates only
        nb = (
            und.join(cand_v, "v", "left_semi")
            .groupBy("v")
            .agg(F.sort_array(F.collect_list("u")).alias("nbrs"))
        )
        cls = (
            nb.groupBy("nbrs")
            .agg(F.min("v").alias("twin_id"), F.count(F.lit(1)).alias("twin_size"))
            .where(F.col("twin_size") >= 2)
        )
        return (
            nb.join(cls.hint("shuffle_hash"), "nbrs")
            .select(
                F.col("v").alias("vertex"),
                "twin_id",
                F.col("twin_size").cast("bigint").alias("twin_size"),
            )
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        if cand_v is not None:
            release(cand_v)
