"""topological_levels vs a pure-Python longest-path oracle on DAGs, plus
cycle / self-loop rejection and the storage-release guard."""

from __future__ import annotations

import random

import pytest

from split_merge_partitioner_spark.graph import topological_levels


def _oracle_levels(edge_list):
    verts = set()
    preds: dict[int, set[int]] = {}
    for a, b in edge_list:
        verts |= {a, b}
        preds.setdefault(b, set()).add(a)
    lvl: dict[int, int] = {}
    pending = set(verts)
    while pending:
        ready = {v for v in pending if preds.get(v, set()) <= lvl.keys()}
        assert ready, "oracle fed a cyclic graph"
        for v in ready:
            lvl[v] = max((lvl[p] + 1 for p in preds.get(v, ())), default=0)
        pending -= ready
    return lvl


def _run(spark, edge_list):
    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r.vertex: r.level for r in topological_levels(df).collect()}
    return got


def test_chain_and_diamond(spark):
    # chain 0->1->2->3 merged with diamond 0->{10,11}->3
    edges = [(0, 1), (1, 2), (2, 3), (0, 10), (0, 11), (10, 3), (11, 3)]
    got = _run(spark, edges)
    assert got == _oracle_levels(edges)
    assert got[0] == 0 and got[3] == 3  # longest path wins, not shortest


def test_multiple_sources_and_duplicate_edges(spark):
    edges = [(0, 2), (1, 2), (2, 3), (1, 3), (0, 2)]
    got = _run(spark, edges)
    assert got == _oracle_levels([(0, 2), (1, 2), (2, 3), (1, 3)])
    assert got[0] == got[1] == 0


def test_random_dags_match_oracle(spark):
    rng = random.Random(5)
    for trial in range(3):
        n = 40 + 20 * trial
        edges = sorted(
            {
                (a, b)
                for a, b in (
                    sorted(rng.sample(range(n), 2)) for _ in range(3 * n)
                )
            }
        )  # src < dst => acyclic by construction
        assert _run(spark, edges) == _oracle_levels(edges)


def test_cycle_raises(spark):
    with pytest.raises(RuntimeError, match="not a DAG"):
        _run(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])


def test_self_loop_raises(spark):
    with pytest.raises(RuntimeError, match="not a DAG"):
        _run(spark, [(0, 1), (1, 1)])


def test_storage_released(spark):
    sc = spark.sparkContext
    before = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(30)] + [(0, 15)], "src long, dst long"
    )
    out = topological_levels(df)
    out.count()
    after = {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}
    # only the returned checkpointed result may pin new storage
    assert len(after - before) <= 1
