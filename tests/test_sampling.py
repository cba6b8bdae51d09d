"""Deterministic sampling operators (functions/sampling.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from split_merge_partitioner_spark.functions import (
    hash_sample,
    hash_split,
    stratified_sample,
)
from split_merge_partitioner_spark.functions.sampling import M31, _A1, _A2


def _h(key: int, seed: int = 42) -> int:
    h = ((key % M31 + M31) % M31 + seed % M31 + 1) % M31
    h = (h * _A1) % M31
    return ((h + 1) * _A2) % M31


@pytest.fixture(scope="module")
def table(spark):
    pdf = pd.DataFrame(
        {"doc_id": range(2000), "grp": [f"g{i % 7}" for i in range(2000)]}
    )
    return spark.createDataFrame(pdf).persist()


def test_hash_matches_python_replay(spark, table):
    from split_merge_partitioner_spark.functions import sample_hash

    got = table.select("doc_id", sample_hash("doc_id").alias("h")).toPandas()
    for k, h in zip(got["doc_id"], got["h"]):
        assert int(h) == _h(int(k)), k


def test_hash_sample_deterministic_and_partition_independent(spark, table):
    a = sorted(r.doc_id for r in hash_sample(table, 0.3).select("doc_id").collect())
    b = sorted(
        r.doc_id
        for r in hash_sample(table.repartition(17), 0.3).select("doc_id").collect()
    )
    assert a == b
    exp = sorted(k for k in range(2000) if _h(k) < int(0.3 * M31))
    assert a == exp
    # ~30% with slack for a 2000-row draw
    assert 0.25 < len(a) / 2000 < 0.35


def test_hash_split_disjoint_exhaustive(spark, table):
    got = hash_split(table).groupBy("split").count().toPandas()
    counts = dict(zip(got["split"], got["count"]))
    assert set(counts) == {"train", "valid", "test"}
    assert sum(counts.values()) == 2000
    assert counts["train"] > counts["valid"]
    # same key same split across tables (coordination contract)
    other = spark.createDataFrame(pd.DataFrame({"doc_id": range(0, 2000, 2)}))
    a = {r.doc_id: r.split for r in hash_split(table).select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in hash_split(other).select("doc_id", "split").collect()}
    assert all(a[k] == b[k] for k in b)


def test_hash_split_validation(spark, table):
    with pytest.raises(ValueError, match="sum to 1"):
        hash_split(table, {"a": 0.5, "b": 0.4})


def test_stratified_sample_caps_and_determinism(spark, table):
    out = stratified_sample(table, "grp", 10)
    pdf = out.toPandas()
    per = pdf.groupby("grp").size()
    assert (per == 10).all()  # every group has >= 10 rows here
    again = stratified_sample(table.repartition(13), "grp", 10).toPandas()
    assert sorted(pdf["doc_id"]) == sorted(again["doc_id"])
    # chosen = the n smallest hashes per group
    for g, sub in pdf.groupby("grp"):
        all_keys = [k for k in range(2000) if f"g{k % 7}" == g]
        exp = sorted(all_keys, key=lambda k: (_h(k), k))[:10]
        assert sorted(sub["doc_id"]) == sorted(exp)


def test_stratified_small_group_kept_whole(spark):
    pdf = pd.DataFrame({"doc_id": range(5), "grp": ["a"] * 3 + ["b"] * 2})
    out = stratified_sample(spark.createDataFrame(pdf), "grp", 10).toPandas()
    assert len(out) == 5
