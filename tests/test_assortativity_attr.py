"""Categorical attribute assortativity (Newman 2003) — exact ppm."""

from __future__ import annotations

from split_merge_partitioner_spark.graph.summary import attribute_assortativity


def _g(spark, pairs, labels):
    e = spark.createDataFrame(sorted(pairs), "src long, dst long")
    l = spark.createDataFrame(sorted(labels.items()), "vertex long, label string")
    return e, l


def _hand_r(pairs, labels):
    dd = [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]
    t = len(dd)
    s = sum(1 for a, b in dd if labels[a] == labels[b])
    rows = {}
    for a, _ in dd:
        rows[labels[a]] = rows.get(labels[a], 0) + 1
    a2 = sum(v * v for v in rows.values())
    num, den = 1_000_000 * (t * s - a2), t * t - a2
    q = abs(num) // abs(den)
    return q if (num >= 0) == (den >= 0) else -q


def test_perfectly_assortative(spark):
    pairs = [(0, 1), (1, 2), (10, 11), (11, 12)]
    labels = {0: "x", 1: "x", 2: "x", 10: "y", 11: "y", 12: "y"}
    e, l = _g(spark, pairs, labels)
    r = attribute_assortativity(e, l).collect()[0]
    assert r.assortativity_ppm == 1_000_000
    assert r.n_pairs == 4 and r.same_label_pairs == 4


def test_disassortative_bipartite(spark):
    pairs = [(u, 10 + v) for u in range(3) for v in range(3)]
    labels = {**{u: "x" for u in range(3)}, **{10 + v: "y" for v in range(3)}}
    e, l = _g(spark, pairs, labels)
    r = attribute_assortativity(e, l).collect()[0]
    assert r.assortativity_ppm == -1_000_000  # all-cross with equal marginals
    assert r.same_label_pairs == 0


def test_matches_hand_formula_mixed(spark):
    import random

    rng = random.Random(6)
    pairs = {(u, v) for u in range(20) for v in range(u + 1, 20) if rng.random() < 0.2}
    labels = {v: "abc"[v % 3] for v in range(20)}
    e, l = _g(spark, pairs, labels)
    r = attribute_assortativity(e, l).collect()[0]
    assert r.assortativity_ppm == _hand_r(pairs, labels)
