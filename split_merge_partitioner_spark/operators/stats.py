"""Partition statistics + validation — the reference's "query" outputs.

Reference parity:
- calculate_stats (RF, balance, CV):  /root/reference/src/partitioner.hpp:35-92
  replication factor = sum(|V_b|)/n at :91; CHECK_EQ(sum |E_b|, m) at :89.
- Jain's fairness index:              /root/reference/src/util.hpp:88-103
- degree-decade RF histogram:         /root/reference/src/hep_partitioner.cpp:79-147
- check_edge validation:              /root/reference/src/fsm_partitioner.hpp:194-227
- edge conservation CHECKs:           /root/reference/src/ne_partitioner.cpp:179 etc.

All metrics are exact (countDistinct, not approx) — RF must match the
reference's formula to tolerance.  Everything is expressed as DataFrame aggs
so Catalyst does map-side partial aggregation; the final metrics row is a
handful of scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def replica_sets(assigned: DataFrame) -> DataFrame:
    """The replica-set relation (bucket, vertex) — reference per-bucket
    dense_bitset is_boundarys (src/partitioner.hpp:30).  Distinct rows."""
    return (
        assigned.select("bucket", F.col("src").alias("vertex"))
        .unionAll(assigned.select("bucket", F.col("dst").alias("vertex")))
        .distinct()
    )


def bucket_sizes(assigned: DataFrame) -> DataFrame:
    """Per-bucket |V_b| (exact distinct replicas) and |E_b|.

    One exploded pass: each edge contributes two (bucket, endpoint) rows, so
    |E_b| = half the row count and |V_b| = countDistinct(endpoint) — one
    exchange instead of the former distinct + groupBy + join shape (values
    identical; guide §2.4)."""
    return (
        assigned.select("bucket", F.explode(F.array("src", "dst")).alias("v"))
        .groupBy("bucket")
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_edges"),
            F.countDistinct("v").alias("n_replicas"),
        )
    )


def partition_stats(assigned: DataFrame, p: int, n: int | None = None, m: int | None = None) -> DataFrame:
    """One-row metrics table (FIXTURES.md F6):
    rf, s_v, s_e, sigma_v, sigma_e, jains_v — formulas per
    src/partitioner.hpp:35-92 and src/util.hpp:88-103."""
    if n is None and m is None:
        # one job for both totals (2m exploded rows; n = distinct endpoints)
        row = (
            assigned.select(F.explode(F.array("src", "dst")).alias("v"))
            .agg(
                (F.count(F.lit(1)) / 2).cast("long").alias("m"),
                F.countDistinct("v").alias("n"),
            )
            .collect()[0]
        )
        n, m = int(row["n"]), int(row["m"])
    if n is None:
        n = (
            assigned.select(F.col("src").alias("v"))
            .unionAll(assigned.select(F.col("dst").alias("v")))
            .distinct()
            .count()
        )
    if m is None:
        m = assigned.count()
    sizes = bucket_sizes(assigned)
    return sizes.agg(
        (F.sum("n_replicas") / F.lit(float(n))).alias("rf"),
        (F.max("n_replicas") / F.lit(n / p)).alias("s_v"),
        (F.max("n_edges") / F.lit(m / p)).alias("s_e"),
        (F.stddev_pop("n_replicas") / F.avg("n_replicas")).alias("sigma_v"),
        (F.stddev_pop("n_edges") / F.avg("n_edges")).alias("sigma_e"),
        (
            (F.sum("n_replicas") * F.sum("n_replicas"))
            / (F.count(F.lit(1)) * F.sum(F.col("n_replicas") * F.col("n_replicas")))
        ).alias("jains_v"),
    )


def compare_partitioners(edges: DataFrame, p: int, seed: int = 42) -> DataFrame:
    """Side-by-side quality table for the stateless partitioner family at the
    same ``p``: one row per method with the A1 metrics (rf, s_v, s_e,
    sigma_v, sigma_e, jains_v), rounded to 6 places — the reference's Table-6
    comparison shape (src/partitioner.hpp:35-92) as ONE query.

    n and m are computed once and shared; the degree table is computed once
    and broadcast into both degree-aware methods, so the whole table costs
    one degree aggregation + four single-pass assignments + four small
    bucket aggregations.  ``p`` must be a perfect square (grid is included).
    """
    from ..sources.edges import degrees
    from .expr_partitioners import (
        dbh_partition,
        grid_partition,
        hybrid_partition,
        random_partition,
    )

    deg = degrees(edges).localCheckpoint(eager=True)
    n = deg.count()
    m = edges.count()
    assigns = {
        "dbh": dbh_partition(edges, p, deg),
        "grid": grid_partition(edges, p),
        "hybrid": hybrid_partition(edges, p, deg),
        "random": random_partition(edges, p, seed),
    }
    out = None
    for name in sorted(assigns):
        st = partition_stats(assigns[name], p, n=n, m=m)
        row = st.select(
            F.lit(name).alias("method"),
            *[F.round(c, 6).alias(c) for c in st.columns],
        )
        out = row if out is None else out.unionAll(row)
    return out


def replication_by_degree_decade(assigned: DataFrame, deg: DataFrame) -> DataFrame:
    """Extended metrics (HEP -extended_metrics analog,
    src/hep_partitioner.cpp:79-147): average replication factor per degree
    decade (1-10, 11-100, ...) — shows how hub replication drives RF."""
    per_vertex = (
        replica_sets(assigned)
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_replicas"))
    )
    return (
        per_vertex.join(F.broadcast(deg), "vertex")
        .select(
            F.floor(F.log10(F.col("degree").cast("double"))).cast("long").alias("decade"),
            "n_replicas",
        )
        .groupBy("decade")
        .agg(
            F.count(F.lit(1)).alias("n_vertices"),
            F.round(F.avg("n_replicas"), 6).alias("avg_replication"),
        )
        .orderBy("decade")
    )


def core_boundary_stats(assigned: DataFrame, deg: DataFrame) -> DataFrame:
    """A4 extended-metrics remainder (HEP compute_stats,
    src/hep_partitioner.cpp:79-147): normalized average degree of "core" vs
    "boundary" vertices, plus the fraction of edges doing cross-partition work.

    Documented deviation: the reference's C and S are HEP-internal expansion
    sets; partitioner-agnostic (and oracle-checkable) equivalents are derived
    from the final assignment — core = vertices living in exactly ONE bucket
    (internal, unreplicated), boundary = vertices replicated into >=2 buckets.
    The reference's invalidated-edge fraction (edges dropped from adjacency
    lists during clean-up, :112) is expansion bookkeeping with no meaning
    post-assignment; the analogous cost metric here is the fraction of edges
    whose BOTH endpoints are replicated (cross_replicated_edge_fraction) —
    the edges that generate mirror traffic on both sides at query time.
    """
    per_vertex = (
        replica_sets(assigned)
        .groupBy("vertex")
        .agg(F.count(F.lit(1)).alias("n_replicas"))
    )
    vd = per_vertex.join(F.broadcast(deg), "vertex")
    avg_all = deg.agg(F.avg("degree")).collect()[0][0]
    core_boundary = vd.agg(
        F.count(F.when(F.col("n_replicas") == 1, 1)).alias("n_core"),
        F.count(F.when(F.col("n_replicas") >= 2, 1)).alias("n_boundary"),
        F.round(
            F.avg(F.when(F.col("n_replicas") == 1, F.col("degree"))) / F.lit(avg_all), 6
        ).alias("norm_avg_deg_core"),
        F.round(
            F.avg(F.when(F.col("n_replicas") >= 2, F.col("degree"))) / F.lit(avg_all), 6
        ).alias("norm_avg_deg_boundary"),
    )
    rep2 = per_vertex.where(F.col("n_replicas") >= 2).select("vertex")
    m = assigned.count()
    cross = (
        assigned.join(rep2.withColumnRenamed("vertex", "src"), "src")
        .join(rep2.withColumnRenamed("vertex", "dst"), "dst")
        .count()
    )
    return core_boundary.withColumn(
        "cross_replicated_edge_fraction", F.round(F.lit(cross / m), 6)
    )


def degree_decade_histogram(deg: DataFrame) -> DataFrame:
    """Vertices per degree decade (1-10, 11-100, ...) —
    src/hep_partitioner.cpp:79-147's extended-metrics histogram axis."""
    return (
        deg.select(
            F.floor(F.log10(F.col("degree").cast("double"))).cast("long").alias("decade")
        )
        .groupBy("decade")
        .agg(F.count(F.lit(1)).alias("n_vertices"))
        .orderBy("decade")
    )


def validate_partition(
    edges: DataFrame,
    assigned: DataFrame,
    p: int,
    k: int | None = None,
    subbuckets_per_final: DataFrame | None = None,
) -> dict:
    """The reference CHECK suite as anti-join emptiness checks (SURVEY.md §5):

    - every edge assigned exactly once (CHECK_EQ(assigned_edges, num_edges),
      ne_partitioner.cpp:179 / fsm_partitioner.cpp:317)
    - no null / out-of-range bucket
    - every vertex replicated somewhere (check_edge, fsm_partitioner.hpp:194-227)

    Returns a dict of violation counts (all 0 == valid); raises nothing —
    callers assert.
    """
    m = edges.count()
    m_assigned = assigned.count()
    null_or_oob = assigned.where(
        F.col("bucket").isNull() | (F.col("bucket") < 0) | (F.col("bucket") >= p)
    ).count()
    missing_edges = edges.join(assigned, ["src", "dst"], "left_anti").count()
    dup_assigned = (
        assigned.groupBy("src", "dst").count().where(F.col("count") > 1).count()
    )
    verts = (
        edges.select(F.col("src").alias("vertex"))
        .unionAll(edges.select(F.col("dst").alias("vertex")))
        .distinct()
    )
    uncovered = verts.join(replica_sets(assigned), "vertex", "left_anti").count()
    out = {
        "edge_count_delta": m_assigned - m,
        "null_or_out_of_range_bucket": null_or_oob,
        "missing_edges": missing_edges,
        "duplicate_assignments": dup_assigned,
        "uncovered_vertices": uncovered,
    }
    if k is not None and subbuckets_per_final is not None:
        # fast/precise merge caps k sub-buckets per final bucket
        # (fsm_partitioner.cpp:153,186)
        out["overfull_final_buckets"] = subbuckets_per_final.where(
            F.col("n_subbuckets") > k
        ).count()
    return out
