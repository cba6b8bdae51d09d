"""graph_diff / degree_deltas: hand-checked statuses, canonicalization
robustness, delta arithmetic."""

from __future__ import annotations

from split_merge_partitioner_spark.graph import degree_deltas, graph_diff


def test_graph_diff_by_hand(spark):
    old = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 9), (5, 4)], "src long, dst long"
    )
    # (4,5) is (5,4) reversed -> persisted; (2,3) dropped; (6,7) added;
    # (2,1) duplicate-reversed of (1,2) -> no phantom change
    new = spark.createDataFrame(
        [(2, 1), (1, 2), (3, 4), (4, 5), (6, 7)], "src long, dst long"
    )
    got = {(r["src"], r["dst"]): r["status"] for r in graph_diff(old, new).collect()}
    assert got == {
        (1, 2): "persisted",
        (2, 3): "removed",
        (3, 4): "persisted",
        (4, 5): "persisted",
        (6, 7): "added",
    }  # the (9,9) self-loop never appears


def test_degree_deltas_by_hand(spark):
    old = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    new = spark.createDataFrame([(1, 2), (1, 3)], "src long, dst long")
    got = {
        r["vertex"]: (r["deg_old"], r["deg_new"], r["delta"])
        for r in degree_deltas(old, new).collect()
    }
    assert got == {1: (1, 2, 1), 2: (2, 1, -1), 3: (1, 1, 0)}
    assert all(dn - do == dl for do, dn, dl in got.values())
