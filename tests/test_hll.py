"""functions/hll.py: registers against the graph/hyperanf.py NumPy kernel
(the shared splitmix64 seeding), estimate sanity, and the determinism
contract (partitioning-invariant, duplicate-insensitive)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions.hll import (
    _M,
    approx_distinct,
    hll_registers,
)
from split_merge_partitioner_spark.graph.hyperanf import init_registers


def _exp_regs(values):
    m = init_registers(np.unique(np.asarray(values, dtype=np.int64)))
    mx = m.max(axis=0)
    return {j: int(r) for j, r in enumerate(mx) if r > 0}


def test_registers_match_hyperanf_kernel(spark):
    rows = [("a", v) for v in range(1, 400)] + [("b", v) for v in range(2000, 2050)]
    df = spark.createDataFrame(rows, "key string, val long")
    got: dict[str, dict[int, int]] = {}
    for r in hll_registers(df, "key", "val").collect():
        got.setdefault(r["key"], {})[r["j"]] = r["r"]
    assert got == {
        "a": _exp_regs(range(1, 400)),
        "b": _exp_regs(range(2000, 2050)),
    }


def test_registers_duplicate_and_partitioning_invariant(spark):
    rows = [("k", v % 37) for v in range(500)]  # heavy duplication
    a = spark.createDataFrame(rows, "key string, val long").repartition(1)
    b = spark.createDataFrame(rows, "key string, val long").repartition(13, "val")
    ra = sorted(map(tuple, hll_registers(a, "key", "val").collect()))
    rb = sorted(map(tuple, hll_registers(b, "key", "val").collect()))
    assert ra == rb
    assert ra == sorted(("k", j, r) for j, r in _exp_regs(range(37)).items())


@pytest.mark.parametrize("n,tol", [(40, 0.35), (3000, 0.30)])
def test_estimate_within_hll_error(spark, n, tol):
    # m = 64 -> relative std error ~ 1.04/sqrt(64) = 13%; assert a loose
    # 2.3-2.7 sigma band (deterministic fixture, so this cannot flake)
    df = spark.createDataFrame([("k", v * 7 + 1) for v in range(n)], "key string, val long")
    est = approx_distinct(df, "key", "val").collect()[0]["approx_distinct"]
    assert abs(est - n) / n < tol


def test_estimate_small_range_exactish(spark):
    # linear-counting regime: tiny sets estimate closely
    df = spark.createDataFrame([("k", v) for v in range(5)], "key string, val long")
    est = approx_distinct(df, "key", "val").collect()[0]["approx_distinct"]
    assert abs(est - 5) < 2


def test_registers_bounded(spark):
    df = spark.createDataFrame([("k", v) for v in range(1000)], "key string, val long")
    regs = hll_registers(df, "key", "val")
    bad = regs.where((F.col("j") < 0) | (F.col("j") >= _M) | (F.col("r") < 1) | (F.col("r") > 59))
    assert bad.count() == 0
    assert regs.count() <= _M
