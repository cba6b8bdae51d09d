"""Maximal matching — the edge-side Luby primitive (Israeli-Itai 1986
style, derandomized with keyed hash priorities).

Round r: every surviving edge draws priority p_r(e) = Lehmer(src·1000003
+ dst, seed+r) — a pure function of (edge, round), so the run is
partitioning-independent and SQL-replayable.  An edge joins the matching
iff its (priority, src, dst) triple is the strict minimum among ALL
surviving edges incident to either of its endpoints (local-minimum on
the line graph; the id tie-break makes winners unique).  Matched
endpoints leave the graph; the global minimum edge always wins, so the
loop terminates, and O(log m) rounds suffice in expectation.

Per round: one explode of each edge to its two endpoints, one
groupBy(vertex)-min, two joins to test the both-endpoints-minimum
condition, two semi-join removals — all Catalyst, no Python.

Why it's here: maximal matching is THE coarsening primitive of multilevel
partitioners (METIS's heavy-edge matching is this loop plus a weight
bias) and a standard symmetry-breaking tool; it complements the MIS
(vertex) primitive in graph/mis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.sampling import sample_hash


def maximal_matching(
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int = 64,
) -> tuple[DataFrame, dict]:
    """((src, dst, round_matched), info): the matched edges of a maximal
    matching over the undirected canonical edge table; ``round_matched``
    is 1-based.  Guarantees: no two matched edges share an endpoint; every
    unmatched input edge has a matched endpoint (maximality)."""
    e = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    matched: DataFrame | None = None
    info = {"rounds": 0, "converged": False}
    for r in range(1, max_rounds + 1):
        if e.isEmpty():
            info["converged"] = True
            break
        info["rounds"] = r
        pr = e.withColumn(
            "__ekey__",
            F.col("src").cast("long") * F.lit(1000003) + F.col("dst").cast("long"),
        ).select("src", "dst", sample_hash("__ekey__", seed + r).alias("p"))
        inc = pr.select(F.col("src").alias("v"), "p", "src", "dst").unionAll(
            pr.select(F.col("dst").alias("v"), "p", "src", "dst")
        )
        vmin = inc.groupBy("v").agg(F.min(F.struct("p", "src", "dst")).alias("m"))
        key = F.struct("p", "src", "dst")
        winners = (
            pr.join(vmin.select(F.col("v").alias("src"), F.col("m").alias("ms")), "src")
            .join(vmin.select(F.col("v").alias("dst"), F.col("m").alias("md")), "dst")
            .where((key == F.col("ms")) & (key == F.col("md")))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        sel = winners.select("src", "dst", F.lit(r).cast("long").alias("round_matched"))
        matched = sel if matched is None else matched.unionAll(sel).localCheckpoint(
            eager=True
        )
        gone = (
            winners.select(F.col("src").alias("v"))
            .unionAll(winners.select(F.col("dst").alias("v")))
            .distinct()
        )
        e = (
            e.join(gone.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        if e.isEmpty():  # resolving on the final allowed round is success
            info["converged"] = True
            break
    else:
        raise RuntimeError(f"matching did not resolve in {max_rounds} rounds")
    if matched is None:
        spark = edges.sparkSession
        return spark.createDataFrame([], "src long, dst long, round_matched long"), info
    return matched, info
