"""HITS hubs & authorities via EXACT integer power iteration.

Kleinberg's HITS (JACM 1999) over a DIRECTED edge table (src -> dst):
    a_t(v) = sum_{u->v} h_{t-1}(u)        (authority gathers over in-edges)
    h_t(u) = sum_{u->v} a_t(v)            (hub gathers over out-edges)
from h_0 = 1, with the normalization hoisted OUT of the loop — the
eigencentrality.py recipe: every iterate stays an exact integer (a_t/h_t
count directed alternating walks), carried as DECIMAL(38,0) on Spark and
HUGEINT in the DuckDB oracle, so the chained-CTE replay matches
hash-for-hash.  The only float arithmetic is the final max-normalized
division per column, rounded to 6.

On this engine's raw co-occurrence graph (bipartite customer -> supplier)
HITS is the centrality that actually separates the two roles: customers
can only be hubs and suppliers only authorities — eigencentrality there
oscillates (bipartite lambda_n = -lambda_1) and has to run on the one-mode
projection instead.  HITS's alternating half-steps ARE the bipartite power
iteration (a = A^T A a), so it converges on exactly the graphs where plain
eigencentrality cannot.

Plan shape: TWO static copies of the edge relation, hash-partitioned once
by each gather key (dst for the a-step, src for the h-step) and
lineage-truncated; each half-step is then one co-located ShuffledHashJoin
(the slim score side arrives hash-partitioned on the same key from the
previous groupBy) + ONE map-side-combined groupBy exchange of
(vertex, decimal128) rows.  Zero Python in the loop; per-round wire cost
is 2m * 24B — the same measured-scaling plan as pagerank combine="jvm".

Overflow is guarded, not hoped away: ||h_t||inf <= (dout_max * din_max)^t,
so the driver checks t*(log10 dout_max + log10 din_max) against the
38-digit budget and fails fast with the remedy (lower n_rounds) instead of
returning Spark's silent decimal NULLs.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def hits(edges: DataFrame, n_rounds: int = 4) -> DataFrame:
    """(vertex, hub, auth) after ``n_rounds`` exact HITS rounds over the
    directed edge table; each score is walk-count / max walk-count for its
    column, rounded to 6 decimals (top hub and top authority score 1.0).
    Vertices on only one side of the walk (e.g. pure sinks) carry 0.0 in
    the other column.
    """
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    by_src = by_dst = None
    try:
        e = edges.select("src", "dst")
        by_src = e.repartition(shuffle_n, "src").localCheckpoint(eager=True)
        by_dst = e.repartition(shuffle_n, "dst").localCheckpoint(eager=True)
        dd = by_src.groupBy("src").count().agg(F.max("count").alias("dout"))
        di = by_dst.groupBy("dst").count().agg(F.max("count").alias("din"))
        row_o = dd.collect()[0]
        row_i = di.collect()[0]
        dout = int(row_o["dout"] or 0)
        din = int(row_i["din"] or 0)
        if dout == 0 or din == 0:
            return spark.createDataFrame([], "vertex long, hub double, auth double")
        # ||h_t||inf <= (dout*din)^t, ||a_t||inf <= din*(dout*din)^(t-1)
        growth = math.log10(max(dout, 2)) + math.log10(max(din, 2))
        if n_rounds * growth > 37:
            raise ValueError(
                f"n_rounds={n_rounds} would overflow DECIMAL(38,0) at max "
                f"out-degree {dout} / in-degree {din}; lower n_rounds to "
                f"<= {int(37 / growth)}"
            )
        # h_0 = 1 on the source side only: the a-step gathers h over srcs,
        # so initializing sinks changes nothing and this keeps state slim
        h = (
            by_src.select("src").distinct()
            .select(F.col("src").alias("vertex"), F.lit(1).cast("decimal(38,0)").alias("x"))
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        a = None
        for _ in range(n_rounds):
            prev_h, prev_a = h, a
            a = (
                by_src.join(
                    h.select(F.col("vertex").alias("src"), "x").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("vertex"))
                .agg(F.sum("x").cast("decimal(38,0)").alias("x"))
                .localCheckpoint(eager=True)
            )
            h = (
                by_dst.join(
                    a.select(F.col("vertex").alias("dst"), "x").hint("shuffle_hash"),
                    "dst",
                )
                .groupBy(F.col("src").alias("vertex"))
                .agg(F.sum("x").cast("decimal(38,0)").alias("x"))
                .localCheckpoint(eager=True)
            )
            release(prev_h)
            if prev_a is not None:
                release(prev_a)
        mh = h.agg(F.max("x").alias("mh"))
        ma = a.agg(F.max("x").alias("ma"))
        out = (
            h.select("vertex", F.col("x").alias("hx"))
            .join(a.select("vertex", F.col("x").alias("ax")), "vertex", "full_outer")
            .crossJoin(F.broadcast(mh))
            .crossJoin(F.broadcast(ma))
            .select(
                "vertex",
                F.round(
                    F.coalesce(F.col("hx"), F.lit(0)).cast("double")
                    / F.col("mh").cast("double"),
                    6,
                ).alias("hub"),
                F.round(
                    F.coalesce(F.col("ax"), F.lit(0)).cast("double")
                    / F.col("ma").cast("double"),
                    6,
                ).alias("auth"),
            )
        )
        return out
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        for df in (by_src, by_dst):
            if df is not None:
                release(df)
