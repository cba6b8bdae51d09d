"""label_propagation_warm vs exact Python replay; chain-continuation
equivalence with the cold plain path; new-vertex init; leak guard."""

from __future__ import annotations

import numpy as np
import pytest

from split_merge_partitioner_spark.graph import (
    label_propagation,
    label_propagation_warm,
)


def _replay(base, delta, prior, n_iter):
    merged = set(base) | set(delta)
    verts = sorted({v for e in merged for v in e})
    lab = {v: prior.get(v, v) for v in verts}
    for _ in range(n_iter):
        cnt: dict[int, dict[int, int]] = {v: {} for v in verts}
        for a, b in merged:
            cnt[a][lab[b]] = cnt[a].get(lab[b], 0) + 1
            cnt[b][lab[a]] = cnt[b].get(lab[a], 0) + 1
        lab = {
            v: min(c, key=lambda L: (-c[L], L)) if (c := cnt[v]) else lab[v]
            for v in verts
        }
    return lab


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def _prior_df(spark, prior):
    return spark.createDataFrame(list(prior.items()), "vertex long, label long")


def test_warm_lp_matches_python_replay(spark):
    rng = np.random.default_rng(11)
    base = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, size=(70, 2)) if a != b})
    delta = sorted({(int(a), int(b)) for a, b in rng.integers(0, 35, size=(20, 2)) if a != b})
    prior = {v: int(v % 7) for v in range(30)}  # arbitrary checkpointed labels
    got = {
        r.vertex: r.label
        for r in label_propagation_warm(
            _df(spark, base), _df(spark, delta), _prior_df(spark, prior), n_iter=3
        ).collect()
    }
    assert got == _replay(base, delta, prior, 3)


def test_warm_lp_empty_delta_continues_the_chain(spark):
    base = sorted({(v, (7 * v + 3) % 25) for v in range(25)} | {(v, (v + 1) % 25) for v in range(25)})
    base = [(a, b) for a, b in base if a != b]
    base_df = _df(spark, base)
    empty = spark.createDataFrame([], "src long, dst long")
    prior = label_propagation(base_df, n_iter=3, mode="plain")
    got = {
        r.vertex: r.label
        for r in label_propagation_warm(base_df, empty, prior, n_iter=2).collect()
    }
    exp = {
        r.vertex: r.label
        for r in label_propagation(base_df, n_iter=5, mode="plain").collect()
    }
    assert got == exp  # warm(LP_3, 2 more) == LP_5, exactly (integer update)


def test_warm_lp_new_vertices_start_at_own_id(spark):
    # delta brings a disjoint pair: after ONE superstep each adopts the
    # other's INIT label (their own ids), proving the 1/n-style own-id init
    base = [(0, 1), (1, 2)]
    delta = [(100, 101)]
    prior = {0: 5, 1: 5, 2: 5}
    got = {
        r.vertex: r.label
        for r in label_propagation_warm(
            _df(spark, base), _df(spark, delta), _prior_df(spark, prior), n_iter=1
        ).collect()
    }
    assert got[100] == 101 and got[101] == 100
    assert got[0] == got[1] == got[2] == 5  # settled community stays put


def test_warm_lp_validation(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        label_propagation_warm(df, df, _prior_df(spark, {0: 0}), n_iter=0)


def test_warm_lp_no_net_storage_growth(spark):
    sc = spark.sparkContext
    base_df = _df(spark, [(v, (v + 1) % 12) for v in range(12)])
    prior = _prior_df(spark, {v: v % 3 for v in range(12)})
    before = len(sc._jsc.sc().getRDDStorageInfo())
    label_propagation_warm(base_df, _df(spark, [(0, 6)]), prior, n_iter=2).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # only the returned state survives
