"""Bow-tie decomposition (graph/bowtie.py) — handcrafted graph exercising
all six Broder classes, plus invariants on the sf fixture digraph."""

from __future__ import annotations

from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph import bowtie_classes

# CORE cycle 1→2→3→1; IN chain 11→10→1; OUT chain 3→20→21;
# TUBE 10→30→20 (bypasses CORE); TENDRIL 10→40 (off IN) and 41→20
# (into OUT); DISC 50→51.
EDGES = [
    (1, 2), (2, 3), (3, 1),
    (11, 10), (10, 1),
    (3, 20), (20, 21),
    (10, 30), (30, 20),
    (10, 40), (41, 20),
    (50, 51),
]
EXPECTED = {
    1: "CORE", 2: "CORE", 3: "CORE",
    10: "IN", 11: "IN",
    20: "OUT", 21: "OUT",
    30: "TUBE",
    40: "TENDRIL", 41: "TENDRIL",
    50: "DISC", 51: "DISC",
}


def test_bowtie_all_classes(spark):
    edges = spark.createDataFrame(EDGES, "src long, dst long")
    out, info = bowtie_classes(edges)
    got = {r["vertex"]: r["cls"] for r in out.collect()}
    assert got == EXPECTED
    assert info["core_component"] == 1
    assert info["counts"] == {
        "CORE": 3, "IN": 2, "OUT": 2, "TUBE": 1, "TENDRIL": 2, "DISC": 2,
    }


def test_bowtie_pure_cycle_is_all_core(spark):
    n = 7
    edges = spark.createDataFrame(
        [(i, (i + 1) % n) for i in range(n)], "src long, dst long"
    )
    out, info = bowtie_classes(edges)
    assert {r["cls"] for r in out.collect()} == {"CORE"}
    assert info["counts"] == {"CORE": n}


def test_bowtie_partition_is_exhaustive_on_fixture(spark):
    # the sf0.001 functional digraph used by the scc/pagerank_directed
    # queries: classes must partition the vertex universe exactly
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    dv = docs.select(F.col("doc_id").alias("v"))
    edges = dv.select(
        F.col("v").alias("src"), ((7 * F.col("v") + 3) % 500).alias("dst")
    ).unionAll(
        dv.where(F.col("v") % 5 == 0).select(
            F.col("v").alias("src"), ((31 * F.col("v") + 17) % 500).alias("dst")
        )
    )
    out, info = bowtie_classes(edges)
    n_verts = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    assert out.count() == n_verts
    assert out.select("vertex").distinct().count() == n_verts
    assert sum(info["counts"].values()) == n_verts
    # CORE is the largest SCC: every CORE vertex carries the same component
    # in a direct SCC run, and its size is the max component size
    from split_merge_partitioner_spark.graph import strongly_connected_components

    labels, _ = strongly_connected_components(edges)
    sizes = labels.groupBy("component").count()
    max_size = sizes.agg(F.max("count")).collect()[0][0]
    assert info["counts"]["CORE"] == max_size
