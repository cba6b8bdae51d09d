"""(α,β)-core: exact parity with a brute-force sequential peel, dense ≡
shuffle executor, core invariants (threshold satisfaction + maximality),
and the fail-fast contracts."""

import numpy as np
import pytest

from split_merge_partitioner_spark.graph.abcore import ab_core


def _brute_ab_core(pairs, alpha, beta):
    """Reference peel: remove ONE offending vertex at a time (any order) —
    the (α,β)-core is order-independent, so this must equal the batched
    simultaneous peel."""
    edges = set(pairs)
    while True:
        ld, rd = {}, {}
        for s, d in edges:
            ld[s] = ld.get(s, 0) + 1
            rd[d] = rd.get(d, 0) + 1
        bad_l = {v for v, c in ld.items() if c < alpha}
        bad_r = {v for v, c in rd.items() if c < beta}
        if not bad_l and not bad_r:
            break
        # remove a single arbitrary offender (order-independence probe)
        if bad_l:
            v = min(bad_l)
            edges = {(s, d) for s, d in edges if s != v}
        else:
            v = min(bad_r)
            edges = {(s, d) for s, d in edges if d != v}
    ld, rd = {}, {}
    for s, d in edges:
        ld[s] = ld.get(s, 0) + 1
        rd[d] = rd.get(d, 0) + 1
    return {(v, "L", c) for v, c in ld.items()} | {(v, "R", c) for v, c in rd.items()}


def _collect(df):
    return {(r.vertex, r.side, r.degree) for r in df.collect()}


def _random_bipartite(seed, nl=40, nr=12, m=260):
    rng = np.random.default_rng(seed)
    pairs = {
        (int(rng.integers(0, nl)), int(1000 + rng.zipf(1.6) % nr))
        for _ in range(m)
    }
    return sorted(pairs)


@pytest.mark.parametrize("seed,alpha,beta", [(1, 3, 8), (2, 2, 5), (3, 4, 12)])
def test_ab_core_matches_sequential_bruteforce(spark, seed, alpha, beta):
    pairs = _random_bipartite(seed)
    df = spark.createDataFrame(pairs, "src long, dst long")
    expected = _brute_ab_core(pairs, alpha, beta)
    for thresh in (10_000_000, 0):  # dense path, then force shuffle path
        got, info = ab_core(df, alpha, beta, dense_threshold=thresh)
        assert _collect(got) == expected, (info, thresh)


def test_ab_core_thresholds_and_maximality(spark):
    pairs = _random_bipartite(7, nl=30, nr=10, m=200)
    alpha, beta = 3, 9
    df = spark.createDataFrame(pairs, "src long, dst long")
    got, _ = ab_core(df, alpha, beta)
    rows = got.collect()
    core_l = {r.vertex for r in rows if r.side == "L"}
    core_r = {r.vertex for r in rows if r.side == "R"}
    core_edges = [(s, d) for s, d in pairs if s in core_l and d in core_r]
    # 1. in-core degrees meet the thresholds and equal the reported degree
    for r in rows:
        dg = sum((e[0] == r.vertex if r.side == "L" else e[1] == r.vertex) for e in core_edges)
        assert dg == r.degree
        assert dg >= (alpha if r.side == "L" else beta)
    # 2. maximality: every peeled vertex fails its threshold against the core
    for v in {s for s, _ in pairs} - core_l:
        assert sum(s == v and d in core_r for s, d in pairs) < alpha
    for v in {d for _, d in pairs} - core_r:
        assert sum(d == v and s in core_l for s, d in pairs) < beta


def test_ab_core_complete_bipartite_and_star(spark):
    # K_{3,4} survives exactly at (alpha,beta) <= (4,3) and dies above
    k34 = [(i, 100 + j) for i in range(3) for j in range(4)]
    df = spark.createDataFrame(k34, "src long, dst long")
    full, info = ab_core(df, 4, 3)
    assert info["rounds"] == 1  # already a fixpoint: one check round
    assert _collect(full) == {(i, "L", 4) for i in range(3)} | {
        (100 + j, "R", 3) for j in range(4)
    }
    empty, _ = ab_core(df, 5, 3)
    assert empty.count() == 0
    # star cascade: center holds degree 5 but every leaf dies at beta=2,
    # so the whole thing unravels in one removal round
    star = [(i, 500) for i in range(5)]
    got, info2 = ab_core(spark.createDataFrame(star, "src long, dst long"), 1, 2)
    assert _collect(got) == {(i, "L", 1) for i in range(5)} | {(500, "R", 5)}
    gone, _ = ab_core(spark.createDataFrame(star, "src long, dst long"), 2, 1)
    assert gone.count() == 0


def test_ab_core_cascade_chain_round_count(spark):
    # path L0-R0-L1-R1-...: alpha=beta=2 peels one layer per round from the
    # ends inward — exercises a multi-round data-dependent peel and the
    # max_rounds fail-fast
    pairs = []
    for i in range(6):
        pairs.append((i, 1000 + i))
        pairs.append((i + 1, 1000 + i))
    df = spark.createDataFrame(pairs, "src long, dst long")
    got, info = ab_core(df, 2, 2)
    assert got.count() == 0
    assert info["rounds"] >= 3
    with pytest.raises(RuntimeError, match="did not finish"):
        ab_core(df, 2, 2, max_rounds=1)


def test_ab_core_validations(spark):
    df = spark.createDataFrame([(1, 2), (2, 3)], "src long, dst long")
    with pytest.raises(ValueError, match="bipartite"):
        ab_core(df, 1, 1)
    ok = spark.createDataFrame([(1, 10)], "src long, dst long")
    with pytest.raises(ValueError, match="alpha and beta"):
        ab_core(ok, 0, 1)
    empty = spark.createDataFrame([], "src long, dst long")
    out, info = ab_core(empty, 1, 1)
    assert out.count() == 0 and info["mode"] == "empty"


def test_ab_core_repartition_determinism(spark):
    pairs = _random_bipartite(11)
    df = spark.createDataFrame(pairs, "src long, dst long")
    a, _ = ab_core(df, 3, 8, dense_threshold=0)
    b, _ = ab_core(df.repartition(13), 3, 8, dense_threshold=0)
    assert _collect(a) == _collect(b)
