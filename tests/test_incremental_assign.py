"""Incremental edge routing vs a pure-Python replay of the routing rule."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.operators import incremental_edge_assign


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "src long, dst long"
    )


def _parts(spark, triples):
    return spark.createDataFrame(
        [(int(a), int(b), int(c)) for a, b, c in triples],
        "src long, dst long, bucket long",
    )


def _py_route(base, delta, p):
    reps: dict[int, set[int]] = {}
    loads = [0] * p
    deg: dict[int, int] = {}
    for s, d, b in base:
        reps.setdefault(s, set()).add(b)
        reps.setdefault(d, set()).add(b)
        loads[b] += 1
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    out = {}
    for s, d in delta:
        cands = {}
        for b in reps.get(s, ()):
            cands[b] = cands.get(b, 0) + 1
        for b in reps.get(d, ()):
            cands[b] = cands.get(b, 0) + 1
        if cands:
            out[(s, d)] = min(
                cands, key=lambda b: (-cands[b], loads[b], b)
            )
        else:
            w = s if deg.get(s, 0) <= deg.get(d, 0) else d
            out[(s, d)] = w % p
    return out


def _spark_route(spark, base, delta, p):
    got = incremental_edge_assign(_parts(spark, base), _edges(spark, delta), p)
    return {(r.src, r.dst): r.bucket for r in got.collect()}


BASE = [(0, 1, 0), (1, 2, 0), (2, 3, 1), (3, 4, 1), (4, 5, 2), (0, 5, 2)]


def test_affinity_both_endpoints_same_bucket(spark):
    # (0, 2): both endpoints replicated in bucket 0 -> score 2 wins there
    assert _spark_route(spark, BASE, [(0, 2)], 4) == {(0, 2): 0}


def test_single_replica_and_load_tiebreak(spark):
    # (2, 5): 2 in {0,1}, 5 in {2} -> all score 1; loads equal (2 each)
    # -> smallest bucket id
    assert _spark_route(spark, BASE, [(2, 5)], 4) == {(2, 5): 0}


def test_new_new_falls_back_to_dbh(spark):
    # 100, 101 unseen: degrees 0 == 0 -> hash src -> 100 % 4 = 0
    assert _spark_route(spark, BASE, [(100, 101)], 4) == {(100, 101): 0}


def test_matches_python_replay(spark):
    import random

    rng = random.Random(11)
    base = [
        (a, b, rng.randrange(4))
        for a, b in {tuple(sorted(rng.sample(range(30), 2))) for _ in range(80)}
    ]
    delta = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(40)})
    assert _spark_route(spark, base, delta, 4) == _py_route(base, delta, 4)


def test_repartition_determinism(spark):
    base = _parts(spark, BASE)
    delta = _edges(spark, [(0, 2), (2, 5), (7, 8), (1, 9)])
    a = {
        (r.src, r.dst): r.bucket
        for r in incremental_edge_assign(base, delta, 4).collect()
    }
    b = {
        (r.src, r.dst): r.bucket
        for r in incremental_edge_assign(
            base.repartition(7), delta.repartition(5), 4
        ).collect()
    }
    assert a == b


def test_bucket_out_of_range_fails(spark):
    with pytest.raises(ValueError):
        incremental_edge_assign(_parts(spark, BASE), _edges(spark, [(0, 2)]), 2)
    with pytest.raises(ValueError):
        incremental_edge_assign(_parts(spark, BASE), _edges(spark, [(0, 2)]), 0)


def test_conservation_and_range(spark):
    delta = [(0, 2), (2, 5), (7, 8), (1, 9), (50, 51)]
    got = _spark_route(spark, BASE, delta, 4)
    assert set(got) == set(delta)
    assert all(0 <= b < 4 for b in got.values())
