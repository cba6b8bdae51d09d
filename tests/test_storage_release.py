"""Leak-regression guard for the iterative graph ops (round-4 VERDICT item 4).

Each iterative operator localCheckpoints per-round relations; the discipline
(the similarity.py r3 precedent, betweenness.py:123-126 model) is that every
CONSUMED relation is unpersisted when replaced, so after a call at most the
result's own storage remains live.  The assertion is on the NUMBER of new
RDDs in executor storage (``sc.getRDDStorageInfo``): the pre-fix behavior
leaked one checkpoint per round/step (5-20 RDDs on these fixtures), the fixed
behavior leaves <= RESULT_BUDGET.
"""

from __future__ import annotations

from pyspark.sql import functions as F

# the result itself may pin storage (it IS the returned relation) plus, for
# tuple-returning ops, one auxiliary relation documented as live-with-result
RESULT_BUDGET = 2


def _stored_ids(spark) -> set[int]:
    return {
        info.id() for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
    }


def _path_edges(spark, n=40):
    # a path: worst case for round counts (many Luby rounds, deep star rounds)
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "src long, dst long"
    )


def _new_after(spark, fn):
    before = _stored_ids(spark)
    result = fn()
    result.count()  # materialize like a caller would
    new = _stored_ids(spark) - before
    # release the caller-owned result storage too (with storage.release —
    # plain DataFrame.unpersist is a no-op on checkpoint blocks), then
    # everything new should be gone except documented live-with-result state
    from split_merge_partitioner_spark.storage import release

    release(result)
    leaked = _stored_ids(spark) - before
    return len(new), len(leaked)


def test_walks_releases_static_and_steps(spark):
    from split_merge_partitioner_spark.graph import random_walks

    e = _path_edges(spark)
    new, leaked = _new_after(
        spark, lambda: random_walks(e, walk_length=4, walks_per_vertex=1)
    )
    # old behavior: adj + (L+1) step states + out = 7 new RDDs
    assert new <= RESULT_BUDGET
    assert leaked == 0


def test_matching_releases_rounds(spark):
    from split_merge_partitioner_spark.graph import maximal_matching

    e = _path_edges(spark)
    new, leaked = _new_after(spark, lambda: maximal_matching(e)[0])
    assert new <= RESULT_BUDGET
    assert leaked <= RESULT_BUDGET - 1


def test_mis_releases_rounds(spark):
    from split_merge_partitioner_spark.graph import maximal_independent_set

    e = _path_edges(spark)
    before = _stored_ids(spark)
    out, _ = maximal_independent_set(e)
    out.count()
    # the returned relation is a join over the `chosen` checkpoint — that one
    # relation is the documented live-with-result state
    assert len(_stored_ids(spark) - before) <= RESULT_BUDGET


def test_scc_releases_rounds(spark):
    from split_merge_partitioner_spark.graph import strongly_connected_components

    # two 3-cycles chained through a DAG path: trims, colors, and marks
    rows = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6), (6, 4)]
    e = spark.createDataFrame(rows, "src long, dst long")
    new, leaked = _new_after(
        spark, lambda: strongly_connected_components(e)[0]
    )
    assert new <= RESULT_BUDGET
    assert leaked == 0


def test_truss_releases_rounds(spark):
    from split_merge_partitioner_spark.graph.truss import ktruss

    # K5 plus a pendant path: peeling drops the path, keeps the clique
    k5 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    rows = k5 + [(4, 5), (5, 6), (6, 7)]
    e = spark.createDataFrame(rows, "src long, dst long")
    before = _stored_ids(spark)
    out = ktruss(e, k=4)
    assert out.count() == 10
    # result plan reads the final peeled edge checkpoint — one live relation
    assert len(_stored_ids(spark) - before) <= RESULT_BUDGET


def test_components_stars_raises_on_budget_exhaustion(spark):
    # ADVICE fix: labels are only meaningful at the star fixpoint
    import pytest

    from split_merge_partitioner_spark.graph import connected_components_stars

    e = _path_edges(spark, n=64)
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components_stars(e, max_rounds=1)


def test_matching_weighted_quantize_resolves_monotone_chain(spark):
    # ADVICE fix: exact-weight dominance resolves ~1 edge/round on a
    # monotone-weight path; the bit-length weight class restores O(log m)
    import pytest

    from split_merge_partitioner_spark.graph import maximal_matching

    rows = [(i, i + 1, i + 1) for i in range(40)]
    e = spark.createDataFrame(rows, "src long, dst long, w long")
    with pytest.raises(RuntimeError, match="resolve"):
        maximal_matching(e, weight_col="w", max_rounds=8)
    out, info = maximal_matching(e, weight_col="w", max_rounds=16, quantize=True)
    assert info["converged"] and info["rounds"] <= 16
    # still a valid maximal matching
    m = out.collect()
    ends = [r["src"] for r in m] + [r["dst"] for r in m]
    assert len(ends) == len(set(ends))
    matched_v = set(ends)
    uncovered = [
        (r["src"], r["dst"])
        for r in e.collect()
        if r["src"] not in matched_v and r["dst"] not in matched_v
    ]
    assert uncovered == []


def test_coloring_releases_rounds(spark):
    from split_merge_partitioner_spark.graph import greedy_coloring

    e = _path_edges(spark, 24)
    new, leaked = _new_after(spark, lambda: greedy_coloring(e)[0])
    # old behavior would leak nb_all + 4 relations per JP round
    assert new <= RESULT_BUDGET
    assert leaked == 0
