"""strongly_connected_components vs a Tarjan oracle on directed graphs:
cycles, DAGs, nested SCC chains, self-loops, functional graphs."""

from __future__ import annotations

import sys

import pytest

from split_merge_partitioner_spark.graph import strongly_connected_components


def _tarjan(edge_list):
    sys.setrecursionlimit(100000)
    adj: dict[int, list[int]] = {}
    verts = set()
    for a, b in edge_list:
        verts |= {a, b}
        if a != b:
            adj.setdefault(a, []).append(b)
    index: dict[int, int] = {}
    low: dict[int, int] = {}
    on: set[int] = set()
    stack: list[int] = []
    comp: dict[int, int] = {}
    counter = [0]

    def strong(v):
        index[v] = low[v] = counter[0]
        counter[0] += 1
        stack.append(v)
        on.add(v)
        for w in adj.get(v, ()):  # noqa: B905
            if w not in index:
                strong(w)
                low[v] = min(low[v], low[w])
            elif w in on:
                low[v] = min(low[v], index[w])
        if low[v] == index[v]:
            members = []
            while True:
                w = stack.pop()
                on.discard(w)
                members.append(w)
                if w == v:
                    break
            root = min(members)
            for w in members:
                comp[w] = root

    for v in sorted(verts):
        if v not in index:
            strong(v)
    return comp


CASES = {
    "two_cycles_bridge": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)],
    "pure_dag": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
    "scc_chain": [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2), (3, 4), (4, 5), (5, 4)],
    "self_loops_and_dups": [(7, 7), (1, 2), (2, 1), (1, 2), (9, 1)],
    "functional": [(v, (7 * v + 3) % 40) for v in range(40)]
    + [(v, (31 * v + 17) % 40) for v in range(0, 40, 5)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_scc_matches_tarjan(spark, name):
    edge_list = CASES[name]
    df = spark.createDataFrame(edge_list, "src long, dst long")
    out, info = strongly_connected_components(df)
    assert info["converged"], info
    got = {r["vertex"]: r["component"] for r in out.collect()}
    assert got == _tarjan(edge_list), (name, info)


def test_scc_direction_is_semantic(spark):
    """Reversing every edge preserves SCCs (they're direction-symmetric)
    but a one-way path must NOT merge: (0->1->2) is 3 singletons."""
    path = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    got = {
        r["vertex"]: r["component"]
        for r in strongly_connected_components(path)[0].collect()
    }
    assert got == {0: 0, 1: 1, 2: 2}


def test_scc_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out, info = strongly_connected_components(empty)
    assert out.count() == 0 and info["converged"]
