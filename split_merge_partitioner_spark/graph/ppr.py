"""Personalized PageRank — random-walk-with-restart mass around a seed set:
the "what is relevant to THIS repo" recommendation query of a link graph
(vs global pagerank's "what matters overall").

    r_{t+1}(v) = (1-d)·s(v) + d · Σ_{u ∈ N(v)} r_t(u) / deg(u)

with s the uniform teleport distribution over ``seeds`` (Haveliwala 2002,
topic-sensitive PageRank).  The undirected canonical graph has no dangling
vertices (every vertex in the edge table has degree >= 1), so Σ_v r(v) = 1
holds exactly at every step (tested).

Execution is the pagerank.py combine="jvm" recipe — the cluster-scale shape,
zero Python in the loop:
- static inputs, built once and localCheckpointed: the doubled edge relation
  hash-partitioned by the gather key ``nb``, and the degree⊕seed table
  hash-partitioned by ``vertex`` (LogicalRDD preserves both partitionings
  across supersteps)
- per superstep, three JVM operators: contribs (rank/degree) join the
  static relation (co-located ShuffledHashJoin — contribs arrive
  hash-partitioned from the previous groupBy, the static side never
  re-exchanges), groupBy(vertex).sum — the ONE exchange per superstep,
  map-side combined — and the teleport recombination join against the
  static degree⊕seed table (exchange-free).
- state localCheckpointed per superstep: constant-size lineage-free plans.

Unlike global pagerank there is no dense broadcast accelerator here: PPR is
typically run for MANY seed sets, so the path that exists at cluster scale
is the only one worth maintaining (run several seed sets as extra columns if
throughput matters — the plan is identical).

Oracle: fixed-iteration runs are replayed as chained SQL CTEs (the
pagerank_10iter recipe) rounded to 9 decimals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def personalized_pagerank(
    edges: DataFrame,
    seeds: list[int],
    damping: float = 0.85,
    n_iter: int = 10,
) -> DataFrame:
    """(vertex, ppr) after ``n_iter`` synchronous supersteps from a uniform
    teleport over ``seeds``.  Canonical deduped src<dst edges expected (the
    repo-wide edge contract); vertices absent from the edge table are
    ignored even if listed in seeds (their teleport share still counts, so
    Σ ppr < 1 in that case — garbage-in surfaced, not hidden)."""
    if not seeds:
        raise ValueError("personalized_pagerank needs a non-empty seed set")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    und = None
    vert = None
    try:
        und = (
            edges.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
            .unionAll(edges.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
            .repartition(shuffle_n, "nb")
            .localCheckpoint(eager=True)
        )
        seed_df = spark.createDataFrame(
            [(int(s),) for s in set(seeds)], "vertex long"
        ).withColumn("s", F.lit(1.0 / len(set(seeds))))
        vert = (
            und.groupBy(F.col("v").alias("vertex"))
            .agg(F.count(F.lit(1)).alias("degree"))
            .join(seed_df, "vertex", "left")
            .select("vertex", "degree", F.coalesce("s", F.lit(0.0)).alias("s"))
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        state = vert.select("vertex", "degree", "s", F.col("s").alias("ppr"))
        state = state.localCheckpoint(eager=True)
        for _ in range(n_iter):
            contribs = state.select(
                F.col("vertex").alias("nb"), (F.col("ppr") / F.col("degree")).alias("c")
            )
            gathered = (
                und.join(contribs.hint("shuffle_hash"), "nb")
                .groupBy(F.col("v").alias("vertex"))
                .agg(F.sum("c").alias("g"))
            )
            state = (
                vert.join(gathered.hint("shuffle_hash"), "vertex", "left")
                .select(
                    "vertex",
                    "degree",
                    "s",
                    (
                        (1.0 - damping) * F.col("s")
                        + damping * F.coalesce("g", F.lit(0.0))
                    ).alias("ppr"),
                )
                .localCheckpoint(eager=True)
            )
        return state.select("vertex", F.round("ppr", 9).alias("ppr"))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if und is not None:
            release(und)
        if vert is not None:
            release(vert)
