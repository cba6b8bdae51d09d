"""Strongly connected components of a DIRECTED graph — trim + forward
coloring + backward marking (the FW-BW/coloring family: Fleischer-
Hendrickson-Pinar 2000; Orzan 2004; the shape GraphX/Pregel SCC uses).

component(v) = min vertex id in v's SCC.  Direction is semantic (the HITS
convention): src → dst.

Per outer round, three pure-JVM phases over the remaining subgraph:
1. **Trim to fixpoint**: a vertex with no in-edges or no out-edges cannot
   sit in a cycle — it IS its singleton SCC.  Iterated trim peels entire
   DAG regions layer by layer (two semi-joins per layer), so acyclic
   graphs resolve without ever running a fixpoint.
2. **Forward coloring**: c(v) = min vertex that reaches v, by min-label
   propagation along edge direction to fixpoint (one co-located join +
   one min-groupBy per step — the superstep shape every other iterative
   op here uses).  Every color class has exactly one root r with c(r)=r.
3. **Backward marking**: within each color class, propagate a mark from
   the root along REVERSED edges (restricted to same-color edges,
   precomputed once per round).  Marked vertices both reach and are
   reached by their root ⇒ SCC(r) = marked members of r's class; their
   component is the root id (provably the SCC minimum: any smaller
   vertex reaching a member would reach the root too, contradicting
   c(r)=r).  Resolved vertices leave the graph; unresolved classes retry
   next round on a strictly smaller graph (every root's SCC resolves, so
   ≥ #roots vertices leave per round).

Outer rounds track the condensation depth, not n — small on real link
graphs; the caps fail fast with the remedy rather than spinning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def strongly_connected_components(
    edges: DataFrame,
    max_outer: int = 64,
    max_steps: int = 1024,
) -> tuple[DataFrame, dict]:
    """((vertex, component), info) over directed (src, dst) edges;
    component = min id in the vertex's SCC.  Self-loops are ignored
    (a vertex is always strongly connected to itself); duplicate edges
    are deduped."""
    spark = edges.sparkSession

    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    # vertex universe from the ORIGINAL edges: a vertex appearing only in a
    # self-loop still owns a singleton-SCC row even though the loop edge is
    # dropped
    verts = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    done: DataFrame | None = None
    info = {"rounds": 0, "trim_layers": 0, "converged": False}

    def _accumulate(acc, new):
        out = (new if acc is None else acc.unionAll(new)).localCheckpoint(eager=True)
        if acc is not None:
            release(acc)  # consumed: the new checkpoint owns the rows
        return out

    for _ in range(max_outer):
        if verts.isEmpty():
            info["converged"] = True
            break
        info["rounds"] += 1
        # -- 1. trim to fixpoint ------------------------------------------
        while True:
            has_out = e.select(F.col("src").alias("v")).distinct()
            has_in = e.select(F.col("dst").alias("v")).distinct()
            core = (
                verts.join(has_out, "v", "left_semi")
                .join(has_in, "v", "left_semi")
                .localCheckpoint(eager=True)
            )
            trimmed = verts.join(core, "v", "left_anti")
            if trimmed.isEmpty():
                release(verts)
                verts = core
                break
            info["trim_layers"] += 1
            done = _accumulate(
                done, trimmed.select(F.col("v").alias("vertex"), F.col("v").alias("component"))
            )
            release(verts)
            verts = core
            prev_e = e
            e = (
                e.join(core.withColumnRenamed("v", "src"), "src", "left_semi")
                .join(core.withColumnRenamed("v", "dst"), "dst", "left_semi")
                .localCheckpoint(eager=True)
            )
            release(prev_e)
        if verts.isEmpty():
            info["converged"] = True
            break
        # -- 2. forward coloring to fixpoint ------------------------------
        color = verts.select("v", F.col("v").alias("c")).localCheckpoint(eager=True)
        for _s in range(max_steps):
            gathered = (
                e.join(color.withColumnRenamed("v", "src").withColumnRenamed("c", "cs"), "src")
                .groupBy(F.col("dst").alias("v"))
                .agg(F.min("cs").alias("cin"))
            )
            new = (
                color.join(gathered, "v", "left")
                .select("v", F.least("c", F.coalesce("cin", "c")).alias("c"))
                .localCheckpoint(eager=True)
            )
            changed = (
                new.join(color.withColumnRenamed("c", "old"), "v")
                .where(F.col("c") != F.col("old"))
                .count()
            )
            release(color)
            color = new
            if changed == 0:
                break
        else:
            raise RuntimeError(
                f"forward coloring did not converge in {max_steps} steps; "
                "raise max_steps (bound: longest shortest path in the graph)"
            )
        # -- 3. backward marking within color classes ---------------------
        e_same = (
            e.join(color.withColumnRenamed("v", "src").withColumnRenamed("c", "ca"), "src")
            .join(color.withColumnRenamed("v", "dst").withColumnRenamed("c", "cb"), "dst")
            .where(F.col("ca") == F.col("cb"))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        marked = color.where(F.col("v") == F.col("c")).select("v").localCheckpoint(
            eager=True
        )
        for _s in range(max_steps):
            newly = (
                e_same.join(marked.withColumnRenamed("v", "dst"), "dst", "left_semi")
                .select(F.col("src").alias("v"))
                .distinct()
                .join(marked, "v", "left_anti")
                .localCheckpoint(eager=True)
            )
            if newly.isEmpty():
                release(newly)
                break
            prev_marked = marked
            marked = marked.unionAll(newly).localCheckpoint(eager=True)
            release(prev_marked)
            release(newly)
        else:
            raise RuntimeError(f"backward marking did not converge in {max_steps} steps")
        resolved = color.join(marked, "v", "left_semi").select(
            F.col("v").alias("vertex"), F.col("c").alias("component")
        )
        done = _accumulate(done, resolved)
        prev_verts = verts
        verts = verts.join(marked, "v", "left_anti").localCheckpoint(eager=True)
        release(prev_verts)
        prev_e = e
        e = (
            e.join(verts.withColumnRenamed("v", "src"), "src", "left_semi")
            .join(verts.withColumnRenamed("v", "dst"), "dst", "left_semi")
            .localCheckpoint(eager=True)
        )
        release(prev_e)
        release(e_same)
        release(marked)
        release(color)
        if verts.isEmpty():  # resolving on the final allowed round is success
            info["converged"] = True
            break
    else:
        raise RuntimeError(
            f"SCC did not resolve in {max_outer} outer rounds "
            "(condensation chain deeper than max_outer)"
        )
    release(verts)  # drained; `done` (the result) is the only live state
    release(e)
    if done is None:
        return (
            spark.createDataFrame([], "vertex long, component long"),
            info,
        )
    # `done` is returned AS the checkpointed relation (no projection wrapper)
    # so storage.release(result) hands the caller full ownership of its blocks
    return done, info


def scc_condensation(edges: DataFrame, **scc_kwargs) -> DataFrame:
    """Condensation DAG of the directed graph: one row per distinct
    (src_comp, dst_comp) pair of DIFFERENT SCCs with an edge between them,
    with ``n_edges`` = how many (deduped, self-loop-free) edges cross —
    the macro-DAG a crawler/scheduler actually plans over once SCCs are
    collapsed.  Provably acyclic, so it composes with dag.topological_levels.

    Execution: one SCC call, then two broadcast-or-shuffle label joins on
    the edge relation and a map-side-combined groupBy — nothing beyond the
    SCC cost itself.
    """
    labels, _ = strongly_connected_components(edges, **scc_kwargs)
    e = (
        edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    out = (
        e.join(
            labels.select(
                F.col("vertex").alias("src"), F.col("component").alias("src_comp")
            ),
            "src",
        )
        .join(
            labels.select(
                F.col("vertex").alias("dst"), F.col("component").alias("dst_comp")
            ),
            "dst",
        )
        .where(F.col("src_comp") != F.col("dst_comp"))
        .groupBy("src_comp", "dst_comp")
        .agg(F.count(F.lit(1)).alias("n_edges"))
        # materialize before releasing the labels the plan reads
        .localCheckpoint(eager=True)
    )
    release(labels)
    return out
