"""Bow-tie decomposition of a directed link graph (Broder et al., WWW 2000,
"Graph structure in the Web") — the canonical macro-structure report for a
web-scale crawl: every vertex is classified relative to the largest strongly
connected component (the CORE) as

- ``CORE``     — member of the largest SCC (ties broken by min component id),
- ``IN``       — reaches the CORE but is not reached from it,
- ``OUT``      — reached from the CORE but does not reach it,
- ``TUBE``     — on an IN→OUT path that bypasses the CORE,
- ``TENDRIL``  — hangs off IN (reachable from IN, never reaches OUT) or
                 feeds OUT (reaches OUT, never entered from IN),
- ``DISC``     — disconnected from all of the above.

Reference parity: the reference computes SCC-free *partitionings* only; the
bow-tie report is downstream analytics in the spirit of its PowerGraph
evaluation jobs (full.pdf §5.4 runs reachability-family tasks — approximate
diameter — over the partitions).  The SCC subroutine here is
``scc.strongly_connected_components`` (trim + FW-BW coloring).

Execution shape (all pure JVM, superstep-per-hop like components.py):
1. one SCC call (its own documented superstep budget),
2. one tiny agg + 1-row collect to pick the CORE component (constant size),
3. four frontier-BFS reachability fixpoints (core→fwd, core→bwd on reversed
   edges, IN→fwd and OUT→bwd on induced subgraphs); each step is one
   co-located join + distinct + anti-join against the reached set —
   O(diameter) supersteps, frontier rows only ever shrink toward 0,
4. one final classification join over the vertex universe.

Correctness note for the induced-subgraph passes: a path from IN to a
vertex that is in neither fwd nor bwd cannot pass through CORE or OUT
(anything downstream of CORE is in OUT/CORE by definition), so restricting
pass 3's edges to endpoints outside fwd is exact, not an approximation —
and symmetrically for OUT with bwd.

At 100 TB: same scaling behavior as connected components — the reached
sets are (vertex) relations partitioned by vertex, frontiers shrink
geometrically on power-law graphs, and no step materializes anything
larger than the vertex set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from .scc import strongly_connected_components

CLASSES = ("CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISC")


def _reach(edges: DataFrame, seeds: DataFrame, max_steps: int) -> DataFrame:
    """All vertices reachable from ``seeds`` (inclusive) along directed
    (src, dst) edges.  Returns a localCheckpointed (v) DataFrame the caller
    owns (release() it when done).  O(eccentricity) supersteps."""
    reached = seeds.select("v").distinct().localCheckpoint(eager=True)
    frontier = reached
    for _ in range(max_steps):
        if frontier.isEmpty():
            if frontier is not reached:
                release(frontier)
            return reached
        nxt = (
            edges.join(frontier.withColumnRenamed("v", "src"), "src")
            .select(F.col("dst").alias("v"))
            .distinct()
            .join(reached, "v", "left_anti")
            .localCheckpoint(eager=True)
        )
        grown = reached.unionAll(nxt).localCheckpoint(eager=True)
        release(reached)
        if frontier is not reached:
            release(frontier)
        reached, frontier = grown, nxt
    raise RuntimeError(
        f"bowtie reachability did not drain in {max_steps} steps — raise "
        "max_steps (bound is the graph's directed eccentricity)"
    )


def bowtie_classes(
    edges: DataFrame, max_steps: int = 256, **scc_kwargs
) -> tuple[DataFrame, dict]:
    """((vertex, cls), info) over directed (src, dst) edges; ``cls`` is one
    of CLASSES.  Self-loops are ignored; duplicate edges deduped.  ``info``
    carries the core component id and per-class counts."""
    labels, scc_info = strongly_connected_components(edges, **scc_kwargs)

    top = (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("component").asc())
        .limit(1)
        .collect()[0]
    )
    core_id = top["component"]

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    e_rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    verts = (
        e.select(F.col("src").alias("v"))
        .unionAll(e.select(F.col("dst").alias("v")))
        .unionAll(
            edges.select(F.col("src").alias("v"))  # self-loop-only vertices
        )
        .distinct()
        .localCheckpoint(eager=True)
    )

    core = labels.where(F.col("component") == core_id).select(
        F.col("vertex").alias("v")
    )
    fwd = _reach(e, core, max_steps)  # CORE ∪ OUT
    bwd = _reach(e_rev, core, max_steps)  # CORE ∪ IN

    ins = bwd.join(fwd, "v", "left_anti").localCheckpoint(eager=True)
    outs = fwd.join(bwd, "v", "left_anti").localCheckpoint(eager=True)

    # induced subgraphs for the TUBE/TENDRIL passes (exactness argued in
    # the module docstring): fwd-from-IN never needs fwd's vertices,
    # bwd-from-OUT never needs bwd's
    e_no_fwd = (
        e.join(fwd.withColumnRenamed("v", "src"), "src", "left_anti")
        .join(fwd.withColumnRenamed("v", "dst"), "dst", "left_anti")
        .select("src", "dst")
        .localCheckpoint(eager=True)
    )
    e_no_bwd = (
        e.join(bwd.withColumnRenamed("v", "src"), "src", "left_anti")
        .join(bwd.withColumnRenamed("v", "dst"), "dst", "left_anti")
        .select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .localCheckpoint(eager=True)
    )
    rf = _reach(e_no_fwd, ins, max_steps)  # IN ∪ (rest reachable from IN)
    rb = _reach(e_no_bwd, outs, max_steps)  # OUT ∪ (rest reaching OUT)

    out = (
        verts.join(
            core.withColumn("is_core", F.lit(True)), "v", "left"
        )
        .join(ins.withColumn("is_in", F.lit(True)), "v", "left")
        .join(outs.withColumn("is_out", F.lit(True)), "v", "left")
        .join(rf.withColumn("is_rf", F.lit(True)), "v", "left")
        .join(rb.withColumn("is_rb", F.lit(True)), "v", "left")
        .select(
            F.col("v").alias("vertex"),
            F.when(F.col("is_core"), "CORE")
            .when(F.col("is_in"), "IN")
            .when(F.col("is_out"), "OUT")
            .when(F.col("is_rf") & F.col("is_rb"), "TUBE")
            .when(F.col("is_rf") | F.col("is_rb"), "TENDRIL")
            .otherwise("DISC")
            .alias("cls"),
        )
        # materialize before dropping the relations it reads — the caller
        # owns this checkpoint (storage.release(result) when done)
        .localCheckpoint(eager=True)
    )
    counts = {
        r["cls"]: r["n"]
        for r in out.groupBy("cls").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    info = {
        "core_component": core_id,
        "counts": counts,
        "scc": scc_info,
    }
    for rel in (labels, fwd, bwd, ins, outs, rf, rb, e_no_fwd, e_no_bwd, e, verts):
        release(rel)
    return out, info
