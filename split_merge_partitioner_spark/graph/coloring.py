"""Distributed greedy graph coloring — Jones-Plassmann (1993), derandomized
with the keyed Lehmer hash (sampling.py) so the whole run is a pure
function of (edges, seed): identical under any partitioning, retry, or
scale-out, and replayable round-for-round in SQL.

Every vertex draws ONE priority p(v) = Lehmer(v, seed).  A vertex colors
itself in the first round where every UNCOLORED neighbor has a strictly
smaller (priority, id) pair — at that point all higher neighbors already
hold colors, and it takes the smallest positive color not used by any
colored neighbor (array_except over sequence(1, k+1): the greedy rule, so
color(v) <= degree(v) + 1 always).  Two adjacent uncolored vertices are
never both ready (the smaller pair is blocked by the larger), so each
round's ready set is independent and the coloring is proper by
construction.  Rounds = the longest strictly-decreasing priority path —
O(log n / log log n) w.h.p. under hashed priorities (Jones-Plassmann's
analysis), NOT bounded by the chromatic number.

Scale shape: the doubled adjacency is built once; per round two
semi/anti joins find the ready frontier, one join + collect_set gathers
colored-neighbor palettes (bounded by degree — the same hub bound the
wedge kernels live with), and the frontier leaves the uncolored relation,
which only shrinks.  All Catalyst; driver state is counts.  Fail-fast
RuntimeError on round exhaustion (the mis.py/scc.py discipline): a
truncated coloring is not a coloring.

No counterpart in the reference engine; coloring is the classic
symmetry-breaking primitive next to MIS/matching (graph/mis.py,
graph/matching.py) — e.g. conflict-free scheduling of partition
maintenance over the FSM buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sampling import sample_hash
from ..storage import release


def greedy_coloring(
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int = 64,
) -> tuple[DataFrame, dict]:
    """((vertex, color, round_colored), info) over the undirected canonical
    edge table; colors are 1-based, round_colored is the Jones-Plassmann
    round in which the vertex fixed its color.  Guarantees: adjacent
    vertices never share a color; color(v) <= degree(v) + 1."""
    e = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    nb_all = (
        e.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
        .unionAll(e.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
        .localCheckpoint(eager=True)
    )
    uncolored = (
        nb_all.select("v")
        .distinct()
        .select("v", sample_hash("v", seed).alias("p"))
        .localCheckpoint(eager=True)
    )
    colored: DataFrame | None = None
    info = {"rounds": 0, "converged": False, "n_colors": 0}
    scratch: list[DataFrame] = [nb_all, uncolored]
    try:
        for r in range(1, max_rounds + 1):
            if uncolored.isEmpty():
                info["converged"] = True
                break
            info["rounds"] = r
            # blockers: uncolored neighbors with a LARGER (priority, id)
            # pair; ready = uncolored vertices with none
            un_nb = uncolored.select(
                F.col("v").alias("nb"), F.col("p").alias("pn")
            )
            blocked = (
                nb_all.join(uncolored, "v")
                .join(un_nb, "nb")
                .where(
                    F.struct(F.col("pn"), F.col("nb"))
                    > F.struct(F.col("p"), F.col("v"))
                )
                .select("v")
            )
            ready = uncolored.join(blocked, "v", "left_anti").select("v")
            # palette: distinct colors held by already-colored neighbors
            if colored is None:
                palettes = ready.select(
                    "v", F.array().cast("array<long>").alias("cs")
                )
            else:
                nb_col = nb_all.join(ready, "v", "left_semi").join(
                    colored.select(F.col("vertex").alias("nb"), "color"), "nb"
                )
                palettes = ready.join(
                    nb_col.groupBy("v").agg(
                        F.array_sort(F.collect_set("color")).alias("cs")
                    ),
                    "v",
                    "left",
                ).select(
                    "v", F.coalesce("cs", F.array().cast("array<long>")).alias("cs")
                )
            newly = palettes.select(
                F.col("v").alias("vertex"),
                F.array_min(
                    F.array_except(
                        F.sequence(
                            F.lit(1).cast("long"),
                            (F.size("cs") + 1).cast("long"),
                        ),
                        F.col("cs"),
                    )
                ).alias("color"),
                F.lit(r).cast("long").alias("round_colored"),
            ).localCheckpoint(eager=True)
            scratch.append(newly)
            prev_colored = colored
            colored = (
                newly if colored is None else colored.unionAll(newly)
            ).localCheckpoint(eager=True)
            scratch.append(colored)
            if prev_colored is not None:
                release(prev_colored)
            prev_un = uncolored
            uncolored = uncolored.join(
                newly.select(F.col("vertex").alias("v")), "v", "left_anti"
            ).localCheckpoint(eager=True)
            scratch.append(uncolored)
            release(prev_un)
        if not info["converged"]:
            raise RuntimeError(
                f"greedy_coloring: not converged after {max_rounds} rounds "
                "(rounds track the longest decreasing-priority path; raise "
                "max_rounds or reseed)"
            )
        if colored is None:  # edgeless input: nothing to color
            spark = edges.sparkSession
            return (
                spark.createDataFrame(
                    [], "vertex long, color long, round_colored long"
                ),
                info,
            )
        out = colored.localCheckpoint(eager=True)
        info["n_colors"] = out.agg(F.max("color")).collect()[0][0]
        return out, info
    finally:
        for df in scratch:
            release(df)
