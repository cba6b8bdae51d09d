"""Partition sinks — the reference's writer family re-expressed as Spark sinks.

Reference parity (/root/reference/src/part_writer.hpp):
- EdgepartWriterOnefile  (:31-52):  one "u v bucket" text file
- EdgepartWriterMultifile (:55-81): one file per bucket
- VertexpartWriter       (:86-107): bucket per vertex (we keep the vertex id
  explicit — line-order contracts don't survive distribution, SURVEY.md S12)
- `-write none` no-op     (:7-27):  just don't call a writer

Plus the METIS adjacency-list export (edgelist2adjlist.hpp:74-89) and the
independent sink re-verification pattern of get_stat (src/get_stat.cpp:19-143):
recompute all metrics FROM the written files, not from in-flight state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_edgepart_multifile(assigned: DataFrame, path: str) -> None:
    """Parquet partitioned by bucket — the scalable sink (one dir per bucket,
    many files within; the 255-file text layout doesn't survive 10^12 rows)."""
    assigned.write.mode("overwrite").partitionBy("bucket").parquet(path)


def write_edgepart_onefile(assigned: DataFrame, path: str) -> None:
    """Single CSV "src dst bucket" — test-scale interop with the reference's
    text format (part_writer.hpp:48-51)."""
    assigned.select("src", "dst", "bucket").coalesce(1).write.mode("overwrite").option(
        "sep", " "
    ).csv(path)


def write_vertexpart(vertex_parts: DataFrame, path: str) -> None:
    vertex_parts.select("vertex", "bucket").write.mode("overwrite").parquet(path)


def write_metis_adjlist(edges: DataFrame, path: str) -> None:
    """METIS .adjlist export (1-based, header "n m"), for external vertex
    partitioner interop (edgelist2adjlist.hpp:74-89).  Test-scale only:
    coalesce(1) text."""
    und = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).unionAll(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    adj = (
        und.groupBy("v")
        .agg(F.sort_array(F.collect_list(F.col("w") + 1)).alias("nbrs"))
        .orderBy("v")
        .select(F.concat_ws(" ", F.col("nbrs").cast("array<string>")).alias("line"))
    )
    adj.coalesce(1).write.mode("overwrite").text(path)


def read_edgepart(spark: SparkSession, path: str) -> DataFrame:
    """Read back a multifile sink for independent re-verification (the
    get_stat pattern): feed the result to operators.stats.partition_stats /
    validate_partition."""
    return spark.read.parquet(path).select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("bucket").cast("long")
    )
