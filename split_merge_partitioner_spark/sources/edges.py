"""Edge-table derivation, canonicalization, dense renumbering, degrees.

Reference parity:
- text edge-list ingest w/ self-loop drop: /root/reference/src/conversions.cpp:12-59
- dense vertex renumbering (get_vid):      /root/reference/src/conversions.hpp:20-28
- undirected degree counting:              /root/reference/src/conversions.hpp:56-57

The reference reads SNAP text files; our engine's native inputs are relational
tables.  Edges are *derived* by key co-occurrence self-joins:

- ``edges_from_repos``:    repos sharing a commit id (co-change links) over the
  Iceberg-style source table (repo, path, commit, lang, content).
- ``edges_from_lineitem``: customer--supplier pairs co-occurring in
  lineitem x orders (the driver's TPC-H-ish testdata), giving a bipartite
  power-law-ish graph for the SQL-oracle checks.

All outputs use (src: long, dst: long), src < dst canonical, deduped,
self-loops dropped — the reference's one relation (src/common.hpp:34-50).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SUPPLIER_OFFSET = 1_000_000  # disjoint id spaces: customer keys < 1e6 in testdata


def canonicalize_edges(df: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Orient src<dst, drop self-loops, dedupe.

    Self-loop drop mirrors /root/reference/src/conversions.cpp:54-56; dedup is
    OUR addition (the reference keeps duplicates; see src/test.cpp:61-76 for
    its disabled dedup utility) — co-occurrence joins make duplicates
    semantically meaningless here.
    """
    lo = F.least(F.col(src), F.col(dst)).cast("long")
    hi = F.greatest(F.col(src), F.col(dst)).cast("long")
    return (
        df.select(lo.alias("src"), hi.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def edges_from_lineitem(spark, sf_dir: str) -> DataFrame:
    """customer--supplier co-occurrence edges from lineitem x orders.

    Vertex ids: customers keep c_custkey; suppliers get +SUPPLIER_OFFSET so the
    two key spaces are disjoint (canonical src=customer < dst=supplier).
    The orders side is small relative to lineitem at scale and joins on the
    orderkey; Catalyst broadcast-joins it under the configured threshold.
    """
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    pairs = (
        lineitem.select("l_orderkey", "l_suppkey")
        .join(orders.select("o_orderkey", "o_custkey"), lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_custkey").cast("long").alias("src"),
            (F.col("l_suppkey").cast("long") + F.lit(SUPPLIER_OFFSET)).alias("dst"),
        )
    )
    return canonicalize_edges(pairs)


def edges_from_repos(repos: DataFrame) -> DataFrame:
    """Co-change links: two repos are linked iff they share a commit id.

    Spark-first: groupBy(commit) -> distinct repo pairs via self-join on the
    commit key, not an n^2 cross product.  At 10^12-file scale the
    (commit, repo) projection is tiny relative to content; commits touching
    huge numbers of repos are skew hubs — we cap pair expansion per commit by
    the distinct-repo projection (dedup BEFORE the self-join).
    """
    cr = repos.select("commit", "repo").distinct()
    # dense repo ids (deterministic: sort by name; parallel zipWithIndex —
    # no one-partition global window on a production path)
    repo_ids = dense_ids(cr.select("repo"), "repo", id_col="rid")
    cr = cr.join(repo_ids, "repo").select("commit", "rid")
    a, b = cr.alias("a"), cr.alias("b")
    pairs = a.join(b, "commit").select(
        F.col("a.rid").alias("src"), F.col("b.rid").alias("dst")
    )
    return canonicalize_edges(pairs)


def edges_from_text(spark, path: str, sep: str = "\t") -> DataFrame:
    """SNAP-style text edge list ingest (reference convert_edgelist,
    src/conversions.cpp:12-59): delimiter-separated vertex pairs, '#'/'%'
    comment lines skipped, self-loops dropped.  NOT canonicalized/deduped
    (matches reference semantics); pipe through canonicalize_edges for the
    engine's canonical relation."""
    from pyspark.sql.types import LongType, StructField, StructType

    schema = StructType([StructField("src", LongType()), StructField("dst", LongType())])
    df = spark.read.csv(path, sep=sep, comment="#", schema=schema)
    # '%' comments (conversions.cpp:33) survive the csv comment option only
    # for '#'; null rows from malformed lines are dropped with them
    return df.where(
        F.col("src").isNotNull() & F.col("dst").isNotNull() & (F.col("src") != F.col("dst"))
    )


def edges_from_adjlist_text(spark, path: str) -> DataFrame:
    """Adjacency-list text ingest (reference convert_adjlist,
    src/conversions.cpp:61-114): each line "v n nbr1 ... nbrn"; the declared
    neighbor count is validated (rows violating it are surfaced by
    ``adjlist_count_violations``)."""
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    toks = F.split(F.trim("value"), r"\s+")
    parsed = raw.select(
        F.element_at(toks, 1).cast("long").alias("v"),
        F.element_at(toks, 2).cast("long").alias("declared_n"),
        F.slice(toks, 3, 1_000_000).cast("array<long>").alias("nbrs"),
    )
    return parsed.select(
        F.col("v").alias("src"), F.explode("nbrs").alias("dst")
    ).where(F.col("src") != F.col("dst"))


def adjlist_count_violations(spark, path: str) -> DataFrame:
    """Rows whose declared neighbor count mismatches the actual list length —
    the reference CHECKs this at parse time (conversions.cpp:79-106)."""
    raw = spark.read.text(path).where(F.length(F.trim("value")) > 0)
    toks = F.split(F.trim("value"), r"\s+")
    parsed = raw.select(
        F.element_at(toks, 1).cast("long").alias("v"),
        F.element_at(toks, 2).cast("long").alias("declared_n"),
        (F.size(toks) - 2).alias("actual_n"),
    )
    return parsed.where(F.col("declared_n") != F.col("actual_n"))


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct vertices appearing as either endpoint."""
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )


def dense_ids(df: DataFrame, col: str, id_col: str = "vid") -> DataFrame:
    """Deterministic dense 0-based ids by ascending ``col`` WITHOUT a global
    single-partition window: range-repartition + sort-within-partitions gives
    globally ordered partitions, and RDD zipWithIndex assigns contiguous
    indices in partition order — every stage stays parallel.  The id of each
    row equals its global sort rank regardless of where the range boundaries
    land, so the output is deterministic run to run."""
    from pyspark.sql.types import LongType, StructField, StructType

    spark = df.sparkSession
    single = df.select(col).distinct()
    sdf = single.repartitionByRange(F.col(col)).sortWithinPartitions(col)
    out_schema = StructType(
        [StructField(col, sdf.schema[col].dataType), StructField(id_col, LongType())]
    )
    rdd = sdf.rdd.zipWithIndex().map(lambda t: (t[0][0], t[1]))
    return spark.createDataFrame(rdd, out_schema)


def renumber_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dense 0-based renumbering (reference get_vid, conversions.hpp:20-28).

    Deterministic: ids assigned by ascending original vertex id.  Returns
    (renumbered edges, mapping[vertex, vid]).  Uses the parallel dense_ids
    path (range-sorted zipWithIndex), never a global one-partition window.
    """
    mapping = dense_ids(vertices_of(edges), "vertex")
    e = (
        edges.join(mapping.withColumnRenamed("vertex", "src"), "src")
        .withColumnRenamed("vid", "src_vid")
        .join(mapping.withColumnRenamed("vertex", "dst"), "dst")
        .withColumnRenamed("vid", "dst_vid")
        .select(F.col("src_vid").alias("src"), F.col("dst_vid").alias("dst"))
    )
    return e, mapping


def degrees(edges: DataFrame) -> DataFrame:
    """Undirected degree table (reference .degree file, conversions.hpp:56-57:
    both endpoints incremented per edge)."""
    return (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("degree"))
    )


def bipartite_project(
    edges: DataFrame,
    min_shared: int = 1,
    weighted: bool = False,
) -> DataFrame:
    """One-mode projection of a bipartite edge table: canonical (src, dst)
    pairs of LEFT-side vertices sharing ≥ ``min_shared`` right-side
    neighbors (plus a ``shared`` count column when ``weighted``).

    The standard bipartite→unimodal step (customer-customer via shared
    suppliers, repo-repo via shared files): self-join on the right key,
    orient src < dst, count, threshold.  ``min_shared`` is the projection's
    scale valve — a right-side hub with degree d contributes d² pairs
    before thresholding, so on power-law data raise ``min_shared`` (or
    pre-cap hub degrees) rather than projecting at 1.  The shuffle is one
    exchange on the shared key + the groupBy on the pair."""
    if min_shared < 1:
        raise ValueError("min_shared must be >= 1")
    a = edges.select(F.col("src").alias("u"), F.col("dst").alias("shared_dst"))
    b = edges.select(F.col("src").alias("v"), F.col("dst").alias("shared_dst"))
    proj = (
        a.join(b, "shared_dst")
        .where(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
    cols = [F.col("u").alias("src"), F.col("v").alias("dst")]
    if weighted:
        cols.append(F.col("shared").cast("long").alias("shared"))
    return proj.select(*cols)


def cochange_edges(
    events: DataFrame,
    window_seconds: int = 3600,
    min_shared: int = 2,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """TEMPORAL co-change edge derivation: an edge between two users when
    they were active in the same (event_type, time-window) bucket at least
    ``min_shared`` times — the event-log twin of the lineitem co-occurrence
    derivation (edges_from_lineitem), and the classic "co-change coupling"
    signal (repos edited in the same commit window, users touched by the
    same incident) that link-graph pipelines mine before partitioning.

    Returns canonical weighted edges (src, dst, shared), src < dst.

    Built as (user, bucket) bipartite distinct -> bipartite_project: the
    window id is an exact integer epoch_us div (window·1e6), so bucketing
    is calendar-free and engine-portable; ``min_shared`` is the projection
    scale valve (a bucket with d users emits C(d,2) pairs — bound bucket
    width accordingly, exactly the bipartite_project hub contract).
    """
    if window_seconds < 1:
        raise ValueError("window_seconds must be >= 1")
    from ..functions.events import EPOCH_US_SQL

    window_us = int(window_seconds) * 1_000_000
    win = F.expr(f"({EPOCH_US_SQL.format(col=ts_col)}) div {window_us}")
    b = events.select(
        F.col(user_col).alias("src"),
        F.concat_ws("|", F.col(type_col), win.cast("string")).alias("dst"),
    ).distinct()
    return bipartite_project(b, min_shared=min_shared, weighted=True)
