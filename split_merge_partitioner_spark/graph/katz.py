"""Katz centrality via an EXACT integer recurrence — the walk-length-
damped completion of the centrality family (degree, eigenvector, Katz,
PageRank, HITS, betweenness, closeness ship alongside).

Katz (1953): x = Sigma_{i>=0} alpha^i (A^i 1) with alpha < 1/lambda_1.
With integer attenuation alpha = 1/c the c^n-scaled partial sum
    y_n = Sigma_{i=0..n} c^{n-i} (A^i 1)
obeys the INTEGER recurrence  y_k = A*y_{k-1} + c^k * 1,  y_0 = 1 —
one gather superstep plus one scalar literal add per round, every iterate
an exact integer in DECIMAL(38,0) / HUGEINT (the eigencentrality.py
recipe, same plan shape: one co-located ShuffledHashJoin + one
map-side-combined exchange per superstep, zero Python).  The output
score = y_n / max(y_n) rounded to 6 is the max-normalized Katz partial
sum; rankings match the converged Katz whenever c > lambda_1, which the
default c = dmax + 1 guarantees (lambda_1 <= dmax).

Overflow is guarded, not hoped away: ||y_k||inf <= (k+1)*max(c, dmax)^k,
checked against the 38-digit budget with the remedy named (lower n_iter
or raise c? — raising c GROWS the c^k term, so the remedy is n_iter).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def katz_centrality(
    edges: DataFrame, n_iter: int = 6, attenuation_den: int | None = None
) -> DataFrame:
    """(vertex, score): max-normalized Katz partial sum after ``n_iter``
    exact supersteps over the undirected canonical edge table;
    ``attenuation_den`` is the integer c in alpha = 1/c (default
    dmax + 1, the smallest integer provably above lambda_1)."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    und = None
    try:
        und = (
            edges.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
            .unionAll(edges.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
            .repartition(shuffle_n, "nb")
            .localCheckpoint(eager=True)
        )
        deg = und.groupBy(F.col("v").alias("vertex")).agg(
            F.count(F.lit(1)).alias("degree")
        )
        dmax = int(deg.agg(F.max("degree")).collect()[0][0] or 0)
        if dmax == 0:
            return spark.createDataFrame([], "vertex long, score double")
        c = int(attenuation_den) if attenuation_den is not None else dmax + 1
        if c < 2:
            raise ValueError("attenuation_den must be >= 2")
        base = max(c, dmax)
        if n_iter * math.log10(base) + math.log10(n_iter + 1) > 37:
            raise ValueError(
                f"n_iter={n_iter} would overflow DECIMAL(38,0) at "
                f"max(c, dmax)={base}; lower n_iter"
            )
        state = (
            deg.select("vertex", F.lit(1).cast("decimal(38,0)").alias("x"))
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        for k in range(1, n_iter + 1):
            contribs = state.select(F.col("vertex").alias("nb"), F.col("x").alias("cx"))
            prev = state
            state = (
                und.join(contribs.hint("shuffle_hash"), "nb")
                .groupBy(F.col("v").alias("vertex"))
                .agg(
                    (
                        F.sum("cx") + F.lit(str(c**k)).cast("decimal(38,0)")
                    ).cast("decimal(38,0)").alias("x")
                )
                .localCheckpoint(eager=True)
            )
            release(prev)
        mx = state.agg(F.max("x").alias("mx"))
        return state.crossJoin(F.broadcast(mx)).select(
            "vertex",
            F.round(F.col("x").cast("double") / F.col("mx").cast("double"), 6).alias(
                "score"
            ),
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        if und is not None:
            release(und)
