"""HybridBL (P8) and BPart (P10) baselines — invariants + contract checks."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.operators import (
    bpart_partition,
    hybridbl_partition,
    validate_partition,
    vertex2edge_partition,
    vertex_partition_by_hash,
    vertex_partition_stats,
)
from split_merge_partitioner_spark.operators.stats import partition_stats
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf, vertices_of


@pytest.fixture(scope="module")
def graph(spark):
    e = spark.createDataFrame(powerlaw_edges_pdf(n=600, m_per_node=5)).persist()
    e.count()
    return e


def test_hybridbl_invariants(spark, graph):
    p = 6
    a = hybridbl_partition(graph, p, degree_threshold=20).persist()
    v = validate_partition(graph, a, p)
    assert all(x == 0 for x in v.values()), v
    # deterministic (no std::random_device): same plan, same assignment
    a2 = hybridbl_partition(graph, p, degree_threshold=20)
    assert a.exceptAll(a2).count() == 0
    a.unpersist()


def test_hybridbl_fusion_locality(spark, graph):
    """Fusion clusters must beat pure random edge placement on RF: BFS
    clusters keep radius-3 neighborhoods co-located (cpp:176-207)."""
    from pyspark.sql import functions as F

    p = 6
    a = hybridbl_partition(graph, p, degree_threshold=20)
    rf = partition_stats(a, p=p).toPandas().iloc[0].rf
    rand = graph.select(
        "src", "dst", F.pmod(F.xxhash64("src", "dst", F.lit(5)), F.lit(p)).alias("bucket")
    )
    rf_rand = partition_stats(rand, p=p).toPandas().iloc[0].rf
    assert rf <= rf_rand, (rf, rf_rand)


def test_bpart_vertex_partition(spark, graph):
    p = 6
    vp = bpart_partition(graph, p).persist()
    n = vp.count()
    assert n == vertices_of(graph).count()
    sizes = vp.groupBy("bucket").count().toPandas()
    assert set(sizes["bucket"]) <= set(range(p))
    # the pair-merge (smallest+largest) is the vertex-balance mechanism:
    # final buckets should be tighter than 2x average
    assert sizes["count"].max() <= 2.0 * n / p
    # conversion to an edge partition satisfies the edge invariants
    a = vertex2edge_partition(graph, vp)
    v = validate_partition(graph, a, p)
    assert all(x == 0 for x in v.values()), v
    st = vertex_partition_stats(graph, vp, p).toPandas().iloc[0]
    assert 0 < st.jains_v <= 1
    vp.unpersist()
