"""Text ingest operators (reference conversions.cpp parity)."""

from __future__ import annotations


from split_merge_partitioner_spark.sources.edges import (
    adjlist_count_violations,
    edges_from_adjlist_text,
    edges_from_text,
)


def test_edges_from_text(spark, tmp_path):
    p = tmp_path / "g.txt"
    p.write_text("# comment\n0\t1\n1\t2\n2\t2\n3\t0\n")
    got = edges_from_text(spark, str(p)).toPandas().sort_values(["src", "dst"]).values.tolist()
    # self-loop (2,2) dropped; direction preserved (not canonicalized)
    assert got == [[0, 1], [1, 2], [3, 0]]


def test_edges_from_adjlist_text(spark, tmp_path):
    p = tmp_path / "g.adj"
    p.write_text("0 2 1 2\n1 1 0\n2 1 0\n")
    got = edges_from_adjlist_text(spark, str(p)).toPandas().sort_values(["src", "dst"]).values.tolist()
    assert got == [[0, 1], [0, 2], [1, 0], [2, 0]]
    assert adjlist_count_violations(spark, str(p)).count() == 0


def test_adjlist_count_violation_detected(spark, tmp_path):
    p = tmp_path / "bad.adj"
    p.write_text("0 3 1 2\n")  # declares 3 neighbors, lists 2
    bad = adjlist_count_violations(spark, str(p)).toPandas()
    assert len(bad) == 1 and bad.iloc[0].v == 0
