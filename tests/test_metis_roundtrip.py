"""v2e reference pipeline roundtrip (VERDICT r4 missing item #2): METIS
adjlist export -> external partitioner output (.part.<p>) -> reader ->
vertex2edge_partition, with A2 stats + conservation invariants.

The reference README.md:63-70 documents: edgelist2adjlist -> gpmetis ->
`-method v2e_metis`; its reader is src/vertex2edgepart.cpp:40-59 (line i =
bucket of vertex i).  gpmetis itself isn't in this sandbox, so the external
step is simulated by writing a valid .part file — the format, not the
partitioner, is what the roundtrip verifies.
"""

from __future__ import annotations

import json
import sys

import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

P = 4


@pytest.fixture(scope="module")
def dense_edges(spark):
    from split_merge_partitioner_spark.sources.edges import renumber_edges

    raw = spark.createDataFrame(powerlaw_edges_pdf(n=200, m_per_node=3))
    e, _ = renumber_edges(raw)
    return e.localCheckpoint(eager=True)


def _fake_metis_part(tmp_path, n: int):
    # what gpmetis would emit: n lines, line i = bucket of metis vertex i
    # (deterministic stand-in: vertex % P with a twist so it isn't the
    # identity of any internal hash)
    path = tmp_path / "graph.adjlist.part.4"
    path.write_text("\n".join(str((3 * v + 1) % P) for v in range(n)) + "\n")
    return str(path)


def test_adjlist_export_then_part_read_roundtrip(spark, dense_edges, tmp_path):
    from split_merge_partitioner_spark.sources.writers import (
        read_metis_vertexparts,
        write_metis_adjlist,
    )

    write_metis_adjlist(dense_edges, str(tmp_path / "adj"))
    n = (
        dense_edges.select(F.col("src").alias("v"))
        .unionAll(dense_edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    part_file = _fake_metis_part(tmp_path, n)
    vp = read_metis_vertexparts(spark, part_file, p=P)
    got = {r["vertex"]: r["bucket"] for r in vp.collect()}
    assert got == {v: (3 * v + 1) % P for v in range(n)}


def test_part_reader_validates_buckets(spark, tmp_path):
    from split_merge_partitioner_spark.sources.writers import read_metis_vertexparts

    bad = tmp_path / "bad.part.4"
    bad.write_text("0\n1\n9\n2\n")
    with pytest.raises(ValueError, match="valid buckets"):
        read_metis_vertexparts(spark, str(bad), p=P)


def test_v2e_from_metis_part_conserves_edges(spark, dense_edges, tmp_path):
    from split_merge_partitioner_spark.operators import (
        validate_partition,
        vertex2edge_partition,
        vertex_partition_stats,
    )
    from split_merge_partitioner_spark.sources.writers import read_metis_vertexparts

    n = (
        dense_edges.select(F.col("src").alias("v"))
        .unionAll(dense_edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    vp = read_metis_vertexparts(spark, _fake_metis_part(tmp_path, n), p=P)
    assigned = vertex2edge_partition(dense_edges, vp).localCheckpoint(eager=True)
    # conservation + replica validity (A7/A8)
    violations = validate_partition(dense_edges, assigned, P)
    assert all(v == 0 for v in violations.values()), violations
    # A2 vertex stats run green on the same partition
    row = vertex_partition_stats(dense_edges, vp, P).collect()[0]
    assert row["balance"] >= 1.0 and 0.0 < row["jains_v"] <= 1.0
    assert 0.0 <= row["cut_ratio"] <= 1.0
    # every edge landed in one of its endpoints' vertex buckets
    vpb = vp.withColumnRenamed("vertex", "src").withColumnRenamed("bucket", "bs")
    vpd = vp.withColumnRenamed("vertex", "dst").withColumnRenamed("bucket", "bd")
    off = (
        assigned.join(vpb, "src")
        .join(vpd, "dst")
        .where((F.col("bucket") != F.col("bs")) & (F.col("bucket") != F.col("bd")))
        .count()
    )
    assert off == 0


def test_v2e_metis_cli(spark, dense_edges, tmp_path, capsys):
    sys.path.insert(0, "jobs")
    import run_partition

    edges_path = str(tmp_path / "edges.parquet")
    dense_edges.write.parquet(edges_path)
    n = (
        dense_edges.select(F.col("src").alias("v"))
        .unionAll(dense_edges.select(F.col("dst").alias("v")))
        .distinct()
        .count()
    )
    part_file = _fake_metis_part(tmp_path, n)
    run_partition.main(
        ["--input", edges_path, "--p", str(P), "--method", "v2e_metis",
         "--vertex_parts", part_file],
        stop=False,
    )
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert all(v == 0 for v in rec["violations"].values()), rec
    assert rec["stats"]["rf"] >= 1.0
