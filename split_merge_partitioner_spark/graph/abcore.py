"""(α,β)-core decomposition of a BIPARTITE graph (Ahmed/Batagelj's
generalized cores; Liu et al., "Efficient (α,β)-core computation in
bipartite graphs", VLDB J. 2020): the maximal subgraph in which every
left-side vertex keeps degree >= α and every right-side vertex keeps
degree >= β.  The bipartite analogue of the k-core — the standard
cohesion/trust primitive for user–item, customer–supplier and
author–paper graphs, where the two sides have structurally different
degree scales and a single k threshold is meaningless (on the sf
fixtures the supplier side sits at ~480 while customers sit at ~33; see
butterflies.py for the same asymmetry argument).

Semantics: simultaneous batched peel.  Each round removes EVERY
currently-alive left vertex with alive-degree < α and right vertex with
alive-degree < β at once; the fixpoint (no removals) is the unique
(α,β)-core by the usual monotonicity argument, and batching makes the
round count O(peel depth), not O(n) — the scheme is order-independent so
every path (and the SQL oracle) lands on the identical subgraph.

Dual executor (pattern of kcore.py / onion.py):
- dense driver path (m <= ``dense_threshold``): edge endpoints as two id
  arrays, per round two np.bincount degree passes and one boolean mask —
  zero supersteps of job overhead at sandbox scale.
- shuffle path (the cluster configuration): per round two map-side-
  combined degree aggregations (one per side) and two leftsemi joins
  back onto the edge relation, localCheckpointed lineage-free; the edge
  relation only ever SHRINKS, so round r costs a fraction of round r-1
  and the whole peel is a small constant times one degree computation.
  Fixpoint detection is the edge count already produced by the
  checkpoint — no extra job.  Rounds are data-dependent =>
  ``max_rounds`` overrun raises RuntimeError (scc.py discipline) rather
  than returning a non-core.

At 100 TB the binding cost is the per-round degree exchange on the
shrinking edge set — the same shape as connected components, with no
Python on any row and no driver-side state beyond one scalar per round.

Reference parity note: the FSM reference (lcj2021/split-merge-partitioner)
has no bipartite analytics; this operator extends the engine's k-core
family (kcore.py, onion.py) to the bipartite raw graph the FSM pipeline
ingests (src/conversions.cpp edge lists are customer–supplier shaped in
our fixture mapping).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def _ab_core_dense(spark, edges: DataFrame, alpha: int, beta: int, max_rounds: int):
    e = edges.select("src", "dst").toPandas()
    s = e["src"].to_numpy(np.int64)
    d = e["dst"].to_numpy(np.int64)
    lv = np.unique(s)
    rv = np.unique(d)
    si = np.searchsorted(lv, s)
    di = np.searchsorted(rv, d)
    alive = np.ones(len(s), bool)
    rounds = 0
    while True:
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"(α,β)-core peel did not finish in {max_rounds} rounds")
        ld = np.bincount(si[alive], minlength=len(lv))
        rd = np.bincount(di[alive], minlength=len(rv))
        bad = alive & ((ld[si] < alpha) | (rd[di] < beta))
        # a dead edge's endpoints have degree 0 < α,β — mask to alive only
        if not bad.any():
            break
        alive &= ~bad
        if not alive.any():
            break  # like the shuffle path: emptying counts no extra check round
    ld = np.bincount(si[alive], minlength=len(lv))
    rd = np.bincount(di[alive], minlength=len(rv))
    rows = [
        (int(v), "L", int(c)) for v, c in zip(lv, ld) if c > 0
    ] + [(int(v), "R", int(c)) for v, c in zip(rv, rd) if c > 0]
    out = spark.createDataFrame(rows, "vertex long, side string, degree long")
    return out, {"rounds": rounds, "mode": "dense"}


def _ab_core_shuffle(spark, edges: DataFrame, alpha: int, beta: int, max_rounds: int):
    e = edges.select("src", "dst").localCheckpoint(eager=True)
    m = e.count()
    rounds = 0
    try:
        while m > 0:
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(
                    f"(α,β)-core peel did not finish in {max_rounds} rounds"
                )
            keep_l = (
                e.groupBy("src")
                .agg(F.count(F.lit(1)).alias("dg"))
                .where(F.col("dg") >= alpha)
                .select("src")
            )
            keep_r = (
                e.groupBy("dst")
                .agg(F.count(F.lit(1)).alias("dg"))
                .where(F.col("dg") >= beta)
                .select("dst")
            )
            ne = (
                e.join(keep_l, "src", "leftsemi")
                .join(keep_r, "dst", "leftsemi")
                .localCheckpoint(eager=True)
            )
            m2 = ne.count()
            if m2 == m:
                # no vertex fell below threshold (any sub-threshold vertex
                # owns >= 1 alive edge, so removals always shrink m)
                release(ne)
                break
            release(e)
            e = ne
            m = m2
        degs = e.select(F.col("src").alias("vertex"), F.lit("L").alias("side")).unionAll(
            e.select(F.col("dst").alias("vertex"), F.lit("R").alias("side"))
        )
        out = (
            degs.groupBy("vertex", "side")
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .localCheckpoint(eager=True)
        )
    finally:
        release(e)
    return out, {"rounds": rounds, "mode": "shuffle"}


def ab_core(
    edges: DataFrame,
    alpha: int,
    beta: int,
    max_rounds: int = 100_000,
    dense_threshold: int = 10_000_000,
    validate: bool = True,
) -> tuple[DataFrame, dict]:
    """((vertex, side, degree) DataFrame, info) — the (α,β)-core of the
    bipartite graph whose left side is ``src`` and right side ``dst``.
    Survivor degrees are their in-core degrees (>= α on 'L', >= β on 'R'
    by construction); an empty DataFrame means the core is empty.

    ``validate=True`` fail-fasts if the two id spaces overlap (the peel's
    side assignment would be ambiguous); skip it only when the caller
    guarantees disjointness (the fixture graphs offset dst by 1e6/2e6).
    """
    if alpha < 1 or beta < 1:
        raise ValueError(f"alpha and beta must be >= 1, got ({alpha}, {beta})")
    spark = edges.sparkSession
    if validate:
        clash = (
            edges.select("src").join(edges.select(F.col("dst").alias("src")), "src", "leftsemi").limit(1).count()
        )
        if clash:
            raise ValueError(
                "edge list is not bipartite-disjoint: some id appears as both "
                "src and dst; offset one side's ids (cf. sources/edges.py)"
            )
    m = edges.count()
    if m == 0:
        return (
            spark.createDataFrame([], "vertex long, side string, degree long"),
            {"rounds": 0, "mode": "empty"},
        )
    if m <= dense_threshold:
        return _ab_core_dense(spark, edges, alpha, beta, max_rounds)
    return _ab_core_shuffle(spark, edges, alpha, beta, max_rounds)
