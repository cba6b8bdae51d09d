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

from ..storage import release


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
    """METIS .adjlist export (1-based, header line "n m"), for external vertex
    partitioner interop (edgelist2adjlist.hpp:74-89).  Requires DENSE vertex
    ids 0..n-1 (run sources.edges.renumber_edges first) because METIS maps
    line number i to vertex i; raises ValueError otherwise.  Isolated-id rows
    cannot occur once ids are dense.  Test-scale only: coalesce(1) text."""
    spark = edges.sparkSession
    bounds = edges.agg(
        F.count(F.lit(1)).alias("m"),
        F.greatest(F.max("src"), F.max("dst")).alias("vmax"),
        F.least(F.min("src"), F.min("dst")).alias("vmin"),
    ).collect()[0]
    m, vmax, vmin = int(bounds["m"]), int(bounds["vmax"]), int(bounds["vmin"])
    und = edges.select(F.col("src").alias("v"), F.col("dst").alias("w")).unionAll(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    n = und.select("v").distinct().count()
    if vmin != 0 or vmax != n - 1:
        raise ValueError(
            f"METIS export needs dense 0-based vertex ids (got min={vmin}, "
            f"max={vmax}, n={n}); apply renumber_edges first"
        )
    adj = (
        und.groupBy("v")
        .agg(F.sort_array(F.collect_list(F.col("w") + 1)).alias("nbrs"))
        .select(
            F.col("v").alias("sort_key"),
            F.concat_ws(" ", F.col("nbrs").cast("array<string>")).alias("line"),
        )
    )
    header = spark.createDataFrame([(-1, f"{n} {m}")], "sort_key long, line string")
    header.unionAll(adj).coalesce(1).sortWithinPartitions("sort_key").select(
        "line"
    ).write.mode("overwrite").text(path)


def write_low_degree_edgelist(edges: DataFrame, path: str, hdf: float = 100.0) -> int:
    """Write the edges incident to at least one LOW-degree vertex (degree <=
    hdf * avg_degree) — the reference's ``-write_low_degree_edgelist``
    ``.low_edgelist`` spill file (src/main.cpp:30, src/hep_graph.cpp:136-144,
    src/hep_partitioner.cpp:154-161), as parquet.  Returns the row count."""
    from .edges import degrees as degrees_of

    deg = degrees_of(edges).localCheckpoint(eager=True)
    thresh = hdf * float(deg.agg(F.avg("degree").alias("a")).collect()[0]["a"])
    degb = F.broadcast(deg)
    e = edges.join(
        degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"), "src"
    ).join(
        degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"), "dst"
    )
    low = e.where(
        (F.col("deg_src") <= thresh) | (F.col("deg_dst") <= thresh)
    ).select("src", "dst")
    low.write.mode("overwrite").parquet(path)
    release(deg)
    # count from the sink, not by re-running the join (get_stat pattern:
    # verify what was written)
    return edges.sparkSession.read.parquet(path).count()


def read_metis_vertexparts(spark: SparkSession, path: str, p: int | None = None) -> DataFrame:
    """Read a METIS/gpmetis partition file (``<graph>.part.<p>``) into a
    (vertex, bucket) DataFrame — the reader half of the reference's v2e
    pipeline (src/vertex2edgepart.cpp:40-59 reads exactly this format).

    Format: n lines, line i (1-based) = the 0-based bucket of METIS vertex i;
    our ``write_metis_adjlist`` export maps dense 0-based id v to METIS
    vertex v+1, so line i corresponds to engine vertex i-1 — i.e. 0-based
    line number = vertex id.

    Line numbering must be exact, so the file is read ``wholetext`` (one JVM
    row) and split with ``posexplode`` — pure JVM, no Python per line, order
    guaranteed.  gpmetis emits one modest text file (n lines), so a single
    row is the right shape; for partition tables at 10^12-vertex scale use
    parquet (read_vertexpart below), not METIS interop text.

    With ``p`` given, validates every bucket is in [0, p) (fail-fast on a
    truncated or mismatched file)."""
    whole = spark.read.text(path, wholetext=True)
    # rtrim only strips spaces; the trailing newline must go via regexp or a
    # phantom empty line N+1 appears
    body = F.regexp_replace(F.col("value"), r"[\r\n]+$", "")
    out = (
        whole.select(
            F.posexplode(F.split(body, r"\r?\n")).alias("vertex", "line")
        )
        .select(
            F.col("vertex").cast("long"),
            F.trim(F.col("line")).cast("long").alias("bucket"),
        )
    )
    if p is not None:
        bad = out.where(
            F.col("bucket").isNull() | (F.col("bucket") < 0) | (F.col("bucket") >= p)
        ).count()
        if bad:
            raise ValueError(
                f"{bad} lines of {path} are not valid buckets in [0, {p})"
            )
    return out


def read_edgepart(spark: SparkSession, path: str) -> DataFrame:
    """Read back a multifile sink for independent re-verification (the
    get_stat pattern): feed the result to operators.stats.partition_stats /
    validate_partition."""
    return spark.read.parquet(path).select(
        F.col("src").cast("long"), F.col("dst").cast("long"), F.col("bucket").cast("long")
    )
