"""Maximal independent set — Luby's algorithm (Luby 1986), derandomized
with per-round keyed hash priorities.

Round r: every surviving vertex draws priority p_r(v) = Lehmer(v, seed+r)
(sampling.py's ANSI-safe hash — a pure function of (vertex, round), so
the run is deterministic under any partitioning AND replayable in SQL).
A vertex joins the MIS iff its (priority, id) pair is strictly smaller
than every surviving neighbor's — the classic local-minimum rule, with
the id tie-break making the winner unique even on hash collisions.
Winners and their neighbors leave the graph; isolated survivors win
trivially.  O(log n) rounds in expectation; each round is one groupBy-min
over the doubled relation + two semi-join removals, all Catalyst.

MIS is the building block the parallel-graph literature reaches for
first (graph coloring, symmetry breaking, matching); here it also pairs
with the partitioner: an MIS over the co-occurrence graph is a maximal
set of pairwise-unrelated entities — a natural diversity sample.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

from ..functions.sampling import sample_hash


def maximal_independent_set(
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int = 64,
) -> tuple[DataFrame, dict]:
    """((vertex, in_mis, round_selected), info) over the undirected
    canonical edge table; ``round_selected`` is 1-based, 0 for vertices
    dominated out.  Guarantees: no two adjacent vertices are both in the
    set; every excluded vertex has a selected neighbor (maximality)."""
    spark = edges.sparkSession
    e = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    chosen: DataFrame | None = None
    info = {"rounds": 0, "converged": False}
    for r in range(1, max_rounds + 1):
        if verts.isEmpty():
            info["converged"] = True
            break
        info["rounds"] = r
        pr = verts.select("v", sample_hash("v", seed + r).alias("p"))
        nb = e.select(F.col("src").alias("v"), F.col("dst").alias("nb")).unionAll(
            e.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
        )
        # smallest neighboring (priority, id) pair per vertex
        nbmin = (
            nb.join(pr.select(F.col("v").alias("nb"), F.col("p").alias("pn")), "nb")
            .groupBy("v")
            .agg(F.min(F.struct("pn", "nb")).alias("m"))
        )
        winners = (
            pr.join(nbmin, "v", "left")
            .where(
                F.col("m").isNull()  # isolated survivor
                | (F.struct(F.col("p"), F.col("v")) < F.col("m"))
            )
            .select("v")
            .localCheckpoint(eager=True)
        )
        sel = winners.select("v", F.lit(r).cast("long").alias("round_selected"))
        prev_chosen = chosen
        chosen = (sel if chosen is None else chosen.unionAll(sel)).localCheckpoint(
            eager=True
        )
        if prev_chosen is not None:
            release(prev_chosen)  # consumed: the new checkpoint owns the rows
        # winners and their dominated neighbors leave
        dominated = (
            nb.join(winners.withColumnRenamed("v", "nb"), "nb", "left_semi")
            .select("v")
            .distinct()
        )
        gone = winners.unionAll(dominated).distinct().localCheckpoint(eager=True)
        prev_verts = verts
        verts = verts.join(gone, "v", "left_anti").localCheckpoint(eager=True)
        release(prev_verts)
        prev_e = e
        e = (
            e.join(verts.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(verts.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        release(prev_e)
        release(gone)
        release(winners)
        if verts.isEmpty():  # resolving on the final allowed round is success
            info["converged"] = True
            break
    else:
        raise RuntimeError(f"MIS did not resolve in {max_rounds} rounds")
    release(verts)  # drained; `chosen` (the result) is the only live state
    release(e)
    universe = (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    if chosen is None:
        return universe.select(
            "vertex", F.lit(False).alias("in_mis"), F.lit(0).cast("long").alias("round_selected")
        ), info
    return (
        universe.join(chosen.withColumnRenamed("v", "vertex"), "vertex", "left").select(
            "vertex",
            F.col("round_selected").isNotNull().alias("in_mis"),
            F.coalesce("round_selected", F.lit(0).cast("long")).alias("round_selected"),
        ),
        info,
    )
