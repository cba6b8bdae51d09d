"""Unit tests: label_spreading (graph/labelspread.py) — clamping,
deterministic tie-break, horizon behavior."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.graph import label_spreading


def _run(spark, edges, seeds, n_rounds=3):
    e = spark.createDataFrame(edges, "src long, dst long")
    s = spark.createDataFrame(seeds, "vertex long, label long")
    return {
        r["vertex"]: (r["label"], r["is_seed"])
        for r in label_spreading(e, s, n_rounds=n_rounds).collect()
    }


def test_spreads_along_path_and_leaves_unreached_null(spark):
    # path 1-2-3-4-5-6, seed at 1 (label 7), 3 rounds reach up to vertex 4
    out = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)], [(1, 7)])
    assert out[1] == (7, True)
    assert out[2] == (7, False) and out[3] == (7, False) and out[4] == (7, False)
    assert out[5][0] is None and out[6][0] is None


def test_majority_and_tie_break(spark):
    # vertex 0 has three labeled neighbors: two label-5, one label-3 → 5;
    # vertex 9 has one neighbor of each label → tie → smaller label (3)
    edges = [(1, 0), (2, 0), (3, 0), (1, 9), (3, 9)]
    seeds = [(1, 5), (2, 5), (3, 3)]
    out = _run(spark, edges, seeds, n_rounds=1)
    assert out[0] == (5, False)
    assert out[9] == (3, False)


def test_seed_labels_are_clamped(spark):
    # seed 1 (label 0) surrounded by three label-9 seeds: stays 0
    edges = [(1, 2), (1, 3), (1, 4)]
    seeds = [(1, 0), (2, 9), (3, 9), (4, 9)]
    out = _run(spark, edges, seeds, n_rounds=2)
    assert out[1] == (0, True)


def test_nonseed_revotes_as_frontier_grows(spark):
    # center 0 adjacent to seed 1 (label 1) and to 2,3 which get label 2
    # in round 1 (via seed 4): round 1 labels 0 from its only labeled
    # neighbor (1), round 2 re-votes 0 to the new majority (2) — hard-label
    # spreading lets non-seeds flip as the labeled frontier grows
    edges = [(0, 1), (0, 2), (0, 3), (2, 4), (3, 4)]
    seeds = [(1, 1), (4, 2)]
    out1 = _run(spark, edges, seeds, n_rounds=1)
    assert out1[0] == (1, False)
    out2 = _run(spark, edges, seeds, n_rounds=2)
    assert out2[0] == (2, False)


def test_rejects_zero_rounds(spark):
    with pytest.raises(ValueError):
        _run(spark, [(1, 2)], [(1, 0)], n_rounds=0)
