"""Bloom registers/membership vs a pure-Python replay + the sketch laws."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.functions.bloom import (
    WORD_BITS,
    _BIT_SEED,
    bloom_membership,
    bloom_registers,
)
from split_merge_partitioner_spark.graph.hyperanf import splitmix64

M, K = 512, 3


def _py_bloom(keys) -> dict[int, int]:
    words: dict[int, int] = {}
    for key in keys:
        for i in range(K):
            idx = int(splitmix64(np.uint64((key + i * _BIT_SEED) % 2**64))) & (M - 1)
            w, b = idx // WORD_BITS, idx % WORD_BITS
            words[w] = words.get(w, 0) | (1 << b)
    return words


@pytest.fixture(scope="module")
def keys_df(spark):
    return spark.createDataFrame(pd.DataFrame({"k": [3, 17, 1_000_003, 42, 9_999_991]}))


def test_registers_match_python_replay(spark, keys_df):
    got = {
        r.word: r.bits
        for r in bloom_registers(keys_df, "k", M, K).collect()
    }
    assert got == _py_bloom([3, 17, 1_000_003, 42, 9_999_991])


def test_no_false_negatives_and_probe_semantics(spark, keys_df):
    regs = bloom_registers(keys_df, "k", M, K)
    probes = spark.createDataFrame(
        pd.DataFrame({"k": [3, 17, 1_000_003, 42, 9_999_991] + list(range(100, 160))})
    )
    mem = {r.key: r.maybe for r in bloom_membership(probes, regs, "k", M, K).collect()}
    # every built key answers maybe=True — Bloom filters never false-negative
    assert all(mem[k] for k in [3, 17, 1_000_003, 42, 9_999_991])
    # and with 5 keys in 512 bits almost all outsiders answer False
    outsiders = [mem[k] for k in range(100, 160)]
    assert sum(outsiders) < len(outsiders) * 0.2


def test_registers_merge_cellwise(spark):
    a = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3]}))
    b = spark.createDataFrame(pd.DataFrame({"k": [3, 4, 5]}))
    both = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3, 4, 5]}))
    ra = {r.word: r.bits for r in bloom_registers(a, "k", M, K).collect()}
    rb = {r.word: r.bits for r in bloom_registers(b, "k", M, K).collect()}
    merged: dict[int, int] = {}
    for w, bits in list(ra.items()) + list(rb.items()):
        merged[w] = merged.get(w, 0) | bits
    rboth = {r.word: r.bits for r in bloom_registers(both, "k", M, K).collect()}
    assert merged == rboth


def test_duplicates_do_not_change_registers(spark):
    once = spark.createDataFrame(pd.DataFrame({"k": [7, 8]}))
    thrice = spark.createDataFrame(pd.DataFrame({"k": [7, 8] * 3}))
    r1 = sorted((r.word, r.bits) for r in bloom_registers(once, "k", M, K).collect())
    r3 = sorted((r.word, r.bits) for r in bloom_registers(thrice, "k", M, K).collect())
    assert r1 == r3


def test_pow2_validation(spark, keys_df):
    with pytest.raises(ValueError, match="power of two"):
        bloom_registers(keys_df, "k", 1000, K)
