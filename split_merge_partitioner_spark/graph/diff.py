"""Graph snapshot diff — the incremental-ingestion primitive.

A 100-TB link graph is rebuilt from snapshots; the first question every
downstream consumer asks is "what changed?"  graph_diff answers it with
set algebra only: per-edge status (added / removed / persisted) via a
full outer join on the canonical pair, and per-vertex degree deltas via
one groupBy over the signed status rows.  Both are single-shuffle,
JVM-only plans that scale exactly like the ingestion join itself; the
diff also feeds the partition-maintenance loop (re-route only edges with
status != persisted through the streaming DBH router instead of
repartitioning the world).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _canon(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def graph_diff(old: DataFrame, new: DataFrame) -> DataFrame:
    """(src, dst, status) for every edge in either snapshot, status in
    {'added', 'removed', 'persisted'} — canonical dedup applied to both
    sides first, so orientation and duplicates can't fake a change."""
    o = _canon(old).withColumn("__o__", F.lit(1))
    n = _canon(new).withColumn("__n__", F.lit(1))
    return (
        o.join(n, ["src", "dst"], "full_outer")
        .select(
            "src",
            "dst",
            F.when(F.col("__o__").isNull(), F.lit("added"))
            .when(F.col("__n__").isNull(), F.lit("removed"))
            .otherwise(F.lit("persisted"))
            .alias("status"),
        )
    )


def degree_deltas(old: DataFrame, new: DataFrame) -> DataFrame:
    """(vertex, deg_old, deg_new, delta) for every vertex in either
    snapshot — exact integers from one groupBy over the signed diff rows
    (persisted edges count into both sides)."""
    d = graph_diff(old, new)
    sides = d.select(F.col("src").alias("vertex"), "status").unionAll(
        d.select(F.col("dst").alias("vertex"), "status")
    )
    return sides.groupBy("vertex").agg(
        F.sum(F.when(F.col("status") != "added", 1).otherwise(0))
        .cast("long")
        .alias("deg_old"),
        F.sum(F.when(F.col("status") != "removed", 1).otherwise(0))
        .cast("long")
        .alias("deg_new"),
        F.sum(
            F.when(F.col("status") == "added", 1)
            .when(F.col("status") == "removed", -1)
            .otherwise(0)
        )
        .cast("long")
        .alias("delta"),
    )
