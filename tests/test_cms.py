"""Count-Min Sketch: exactness of registers, one-sided estimate guarantee."""

from __future__ import annotations

import random
from collections import Counter

import pytest

from split_merge_partitioner_spark.functions.cms import (
    cms_estimate,
    cms_heavy_hitters,
    cms_registers,
)


def _events(spark, rows):
    return spark.createDataFrame(rows, "key string, value long")


def test_registers_sum_to_input_size_per_row(spark):
    rng = random.Random(5)
    rows = [("k", rng.randrange(1000)) for _ in range(500)]
    regs = cms_registers(_events(spark, rows), "key", "value", d=4, w=64).collect()
    per_row = Counter()
    for r in regs:
        per_row[r.row] += r.c
    # every hash row sees every input exactly once
    assert per_row == {0: 500, 1: 500, 2: 500, 3: 500}


def test_estimate_never_underestimates_and_exact_when_sparse(spark):
    rng = random.Random(11)
    vals = [rng.randrange(50) for _ in range(400)]
    truth = Counter(vals)
    df = _events(spark, [("k", v) for v in vals])
    cands = _events(spark, [("k", v) for v in sorted(truth)])
    est = {
        r.value: r.est
        for r in cms_estimate(df, cands, "key", "value", d=4, w=256).collect()
    }
    assert set(est) == set(truth)
    for v, t in truth.items():
        assert est[v] >= t  # the one-sided CMS guarantee
    # 50 distinct values in 4x256 counters: collisions in ALL 4 rows are
    # vanishingly unlikely — estimates should be exact here
    assert est == dict(truth)


def test_heavy_hitters_contains_all_true_hitters(spark):
    rows = [("a", 7)] * 100 + [("a", 9)] * 40 + [("a", i) for i in range(200, 260)]
    df = _events(spark, rows)
    hh = {(r.key, r.value): r.est for r in
          cms_heavy_hitters(df, "key", "value", threshold=40, d=4, w=256).collect()}
    assert hh[("a", 7)] >= 100 and hh[("a", 9)] >= 40
    # no false negatives by construction; with this sparsity, no false positives
    assert set(hh) == {("a", 7), ("a", 9)}


def test_registers_merge_across_shards(spark):
    # sketch additivity: registers(df1 ∪ df2) == cellwise sum
    rows1 = [("k", v) for v in range(30)] * 3
    rows2 = [("k", v) for v in range(15, 45)] * 2
    r_all = {(r.row, r.slot): r.c for r in
             cms_registers(_events(spark, rows1 + rows2), "key", "value").collect()}
    r1 = {(r.row, r.slot): r.c for r in
          cms_registers(_events(spark, rows1), "key", "value").collect()}
    r2 = {(r.row, r.slot): r.c for r in
          cms_registers(_events(spark, rows2), "key", "value").collect()}
    merged = Counter(r1)
    merged.update(r2)
    assert dict(merged) == r_all


def test_w_must_be_power_of_two(spark):
    with pytest.raises(ValueError):
        cms_registers(_events(spark, [("k", 1)]), "key", "value", w=100)
