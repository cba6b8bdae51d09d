#!/usr/bin/env python
"""Capture explain("formatted") for the round-6-touched query shapes.

Run from either tree:  python scripts/capture_plans_r06.py <suffix>
writes plans/r06/<name>_<suffix>.txt  (suffix: before | after)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.getcwd())
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = sys.argv[2] if len(sys.argv) > 2 else "plans/r06"


def explain(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    suffix = sys.argv[1]
    os.makedirs(OUT, exist_ok=True)
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.operators import dbh_partition
    from split_merge_partitioner_spark.operators.stats import bucket_sizes, partition_stats
    from split_merge_partitioner_spark.session import get_spark
    from split_merge_partitioner_spark.sources import edges_from_lineitem

    spark = get_spark(app_name=f"plans-{suffix}")
    plans = {}
    edges = edges_from_lineitem(spark, SF).persist()
    edges.count()
    assigned = dbh_partition(edges, 8).localCheckpoint(eager=True)

    plans["bucket_sizes"] = bucket_sizes(assigned)
    plans["partition_stats"] = partition_stats(assigned, p=8)

    # one louvain round as the loop builds it (state checkpointed, round 1)
    from split_merge_partitioner_spark.storage import release

    w0 = F.lit(1).cast("long")
    e = edges.select("src", "dst", w0.alias("w"))
    proper = e.where(F.col("src") != F.col("dst"))
    und = proper.select(F.col("src").alias("u"), F.col("dst").alias("v"), "w").unionAll(
        proper.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w")
    )
    deg = und.select("u", "w").groupBy("u").agg(F.sum("w").alias("k")).localCheckpoint(eager=True)
    m2 = int(deg.agg(F.sum("k")).collect()[0][0])
    state = deg.select("u", F.col("u").alias("comm")).localCheckpoint(eager=True)
    r = 1
    nbr_comm = und.join(state.select(F.col("u").alias("v"), F.col("comm").alias("cv")), "v")
    nc = nbr_comm.groupBy("u", "cv").agg(F.sum("w").alias("w"))
    tot = state.join(deg, "u").groupBy("comm").agg(F.sum("k").alias("tot"))
    cand = (
        nc.select("u", F.col("cv").alias("c"), "w")
        .unionAll(state.select("u", F.col("comm").alias("c"), F.lit(0).cast("long").alias("w")))
        .groupBy("u", "c")
        .agg(F.sum("w").alias("w"))
    )
    scored = (
        cand.join(state, "u")
        .join(deg, "u")
        .join(tot.select(F.col("comm").alias("c"), "tot"), "c")
        .select(
            "u", "c", "comm",
            (F.lit(m2) * F.col("w") - F.col("k") * (
                F.col("tot") - F.when(F.col("c") == F.col("comm"), F.col("k")).otherwise(F.lit(0))
            )).alias("score"),
        )
    )
    if suffix == "before":
        from pyspark.sql import Window

        w_best = Window.partitionBy("u").orderBy(F.col("score").desc(), F.col("c").asc())
        best = (
            scored.withColumn("rn", F.row_number().over(w_best))
            .where(F.col("rn") == 1)
            .select("u", F.when((F.col("u") + F.lit(r)) % 2 == 0, F.col("c")).otherwise(F.col("comm")).alias("comm"))
        )
    else:
        best = (
            scored.groupBy("u", "comm")
            .agg(F.max_by("c", F.struct(F.col("score"), (-F.col("c")).alias("nc"))).alias("c"))
            .select("u", F.when((F.col("u") + F.lit(r)) % 2 == 0, F.col("c")).otherwise(F.col("comm")).alias("comm"))
        )
    plans["louvain_round_distributed"] = best
    release(deg), release(state)

    from split_merge_partitioner_spark.functions import minhash_near_duplicates

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plans["minhash_dedup"] = minhash_near_duplicates(docs, threshold=0.4)

    for name, df in plans.items():
        with open(f"{OUT}/{name}_{suffix}.txt", "w") as f:
            f.write(explain(df))
        print(f"wrote {name}_{suffix}: exchanges={explain(df).count('Exchange')}")
    spark.stop()


if __name__ == "__main__":
    main()
