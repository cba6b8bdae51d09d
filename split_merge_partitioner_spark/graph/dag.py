"""Topological levels on a DAG — the dependency-depth query of a link
graph (build order of a package graph, stage depth of a task graph,
citation depth of a crawl frontier).

level(v) = length of the LONGEST path ending at v, equivalently the Kahn
layer: sources (in-degree 0) are level 0, and every other vertex settles
one round after its last unsettled in-neighbor.  Exact integers end to
end, so the DuckDB oracle (distinct-UNION recursive CTE: the set of
(vertex, walk-length) pairs is finite on a DAG, MAX(l) per vertex is the
same longest-path level) matches hash-for-hash.

Plan: two shrinking relations — ``unsettled`` vertices and ``unsat``
edges (edges whose src is unsettled; only those block their dst).  Each
round is two anti-joins (blocked dsts; then the round's newly-settled
vertices) and two monotone shrink steps, all over localCheckpointed
constant-size plans (the katz.py/scc.py discipline: consumed relations
released as replaced, AQE off in the loop so the per-round job count
stays flat).  Round count = DAG depth — the same diameter-bounded job
model as bfs/sssp, NOT per-vertex jobs.  At 100 TB the relations live in
executor storage and shrink geometrically for shallow web-ish DAGs; no
driver-side state beyond two counts per round.

Cycle detection falls out for free: a round that settles nothing while
vertices remain means every remaining vertex has an unsettled in-neighbor
— the remaining subgraph contains a directed cycle — and the operator
raises rather than returning partial levels (the components.py fixpoint
rule: labels are only meaningful at the fixpoint).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def topological_levels(edges: DataFrame, max_rounds: int = 1024) -> DataFrame:
    """(vertex, level) for every endpoint of the DIRECTED (src, dst) edge
    table (deduped here): level = longest-path-from-any-source = Kahn
    layer.  Raises RuntimeError if the graph has a directed cycle (incl.
    self-loops) or ``max_rounds`` (depth bound) is exhausted."""
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    unsat = None
    unsettled = None
    settled_parts: list[DataFrame] = []
    try:
        unsat = (
            edges.select("src", "dst")
            .dropDuplicates(["src", "dst"])
            .repartition(shuffle_n, "dst")
            .localCheckpoint(eager=True)
        )
        unsettled = (
            unsat.select(F.col("src").alias("vertex"))
            .unionAll(unsat.select(F.col("dst").alias("vertex")))
            .distinct()
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        remaining = unsettled.count()
        for level in range(max_rounds + 1):
            if remaining == 0:
                break
            blocked = unsat.select(F.col("dst").alias("vertex")).distinct()
            newly = (
                unsettled.join(blocked.hint("shuffle_hash"), "vertex", "left_anti")
                .select("vertex", F.lit(level).cast("long").alias("level"))
                .localCheckpoint(eager=True)
            )
            n_new = newly.count()
            if n_new == 0:
                raise RuntimeError(
                    f"not a DAG: {remaining} vertices remain but none is "
                    "source-free — the remaining subgraph contains a "
                    "directed cycle (levels are only meaningful on a DAG)"
                )
            settled_parts.append(newly)
            keys = newly.select("vertex")
            prev_unsat, prev_unsettled = unsat, unsettled
            unsat = (
                unsat.join(
                    keys.withColumnRenamed("vertex", "src").hint("shuffle_hash"),
                    "src",
                    "left_anti",
                )
                .repartition(shuffle_n, "dst")
                .localCheckpoint(eager=True)
            )
            unsettled = (
                unsettled.join(keys.hint("shuffle_hash"), "vertex", "left_anti")
                .repartition(shuffle_n, "vertex")
                .localCheckpoint(eager=True)
            )
            release(prev_unsat)
            release(prev_unsettled)
            remaining -= n_new
        else:
            raise RuntimeError(
                f"DAG depth exceeds max_rounds={max_rounds}; raise max_rounds"
            )
        if not settled_parts:
            return spark.createDataFrame([], "vertex long, level long")
        out = reduce(DataFrame.unionAll, settled_parts)
        # the per-round pieces stay pinned only until the caller's first
        # action over `out`; release them once the union is materialized
        out = out.localCheckpoint(eager=True)
        for part in settled_parts:
            release(part)
        settled_parts = []
        return out
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if unsat is not None:
            release(unsat)
        if unsettled is not None:
            release(unsettled)
        for part in settled_parts:
            release(part)
