"""structural_twins (graph/twins.py) vs a pure-Python set-equality replay
plus the textbook twin facts (open vs closed, hub prefilter, caps)."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.graph import structural_twins


def _replay(pairs, closed):
    adj: dict[int, set[int]] = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    key = {
        v: frozenset(ns | {v}) if closed else frozenset(ns) for v, ns in adj.items()
    }
    cls: dict[frozenset, list[int]] = {}
    for v, k in key.items():
        cls.setdefault(k, []).append(v)
    return {
        v: (min(members), len(members))
        for members in cls.values()
        if len(members) >= 2
        for v in members
    }


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _got(df):
    return {r.vertex: (r.twin_id, r.twin_size) for r in df.collect()}


def test_open_twins_star_leaves(spark):
    # star K1,4: the 4 leaves all have N = {0} -> one open class of 4;
    # the hub is alone.  Closed twins: none (leaves are not adjacent).
    star = _df(spark, [(0, i) for i in range(1, 5)])
    assert _got(structural_twins(star)) == {i: (1, 4) for i in range(1, 5)}
    assert _got(structural_twins(star, closed=True)) == {}


def test_closed_twins_triangle(spark):
    # K3: every pair is a closed twin (N[v] = {0,1,2} for all); open twins
    # none (v is missing from its own open neighborhood).
    k3 = _df(spark, [(0, 1), (1, 2), (0, 2)])
    assert _got(structural_twins(k3, closed=True)) == {v: (0, 3) for v in range(3)}
    assert _got(structural_twins(k3)) == {}


def test_matches_python_replay_powerlaw_plus_planted(spark):
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=150, m_per_node=3, seed=11)
    pairs = list(zip((int(x) for x in pdf["src"]), (int(x) for x in pdf["dst"])))
    # plant two twin pods on fresh ids so the result is non-vacuous
    pairs += [(1000, 0), (1001, 0), (1000, 1), (1001, 1)]  # open twins
    pairs += [(2000, 2001), (2000, 5), (2001, 5)]  # closed twins
    df = _df(spark, pairs)
    for closed in (False, True):
        assert _got(structural_twins(df, closed=closed)) == _replay(pairs, closed)


def test_duplicate_and_reversed_edges_are_set_semantics(spark):
    # the same pod wired with repeats and flipped directions must not
    # change set equality
    pairs = [(1, 0), (0, 1), (2, 0), (1, 0)]
    assert _got(structural_twins(_df(spark, pairs))) == {1: (1, 2), 2: (1, 2)}


def test_max_degree_caps_stage2(spark):
    # hubs 10/11 are degree-3 twins; the cap=2 run must drop THEIR class but
    # keep the low-degree ones (leaves 20/21 and the degree-2 pair 1/2)
    pairs = [(10, i) for i in (0, 1, 2)] + [(11, i) for i in (0, 1, 2)]
    pairs += [(20, 0), (21, 0)]
    uncapped = _got(structural_twins(_df(spark, pairs)))
    assert uncapped[10] == (10, 2) and uncapped[11] == (10, 2)
    got = _got(structural_twins(_df(spark, pairs), max_degree=2))
    assert got == {1: (1, 2), 2: (1, 2), 20: (20, 2), 21: (20, 2)}


def test_self_loops_ignored(spark):
    pairs = [(1, 1), (1, 0), (2, 0), (2, 2)]
    assert _got(structural_twins(_df(spark, pairs))) == {1: (1, 2), 2: (1, 2)}


def test_restores_ansi_conf(spark):
    before = spark.conf.get("spark.sql.ansi.enabled")
    structural_twins(_df(spark, [(0, 1), (0, 2)])).collect()
    assert spark.conf.get("spark.sql.ansi.enabled") == before


def test_no_net_storage_growth(spark):
    # the similarity.py r3 leak-regression discipline: the candidate-list
    # checkpoint must be released; only the (small) result stays live
    sc = spark.sparkContext
    df = _df(spark, [(0, i) for i in range(1, 5)] + [(9, 8)])
    before = len(sc._jsc.sc().getRDDStorageInfo())
    res = structural_twins(df)
    res.collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # the result checkpoint itself
