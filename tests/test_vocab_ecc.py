"""Unit tests: vocab_growth (text.py) and eccentricity_profile
(closeness.py) — hand-computed expectations."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.functions.text import vocab_growth
from split_merge_partitioner_spark.graph import eccentricity_profile


def test_vocab_growth_hand_computed(spark):
    # bucket 0 (docs 0-1): tokens [a b a], [b c] -> 5 tokens, new {a,b,c}=3
    # bucket 1 (docs 2-3): tokens [c d], []    -> 2 tokens, new {d}=1
    docs = spark.createDataFrame(
        [(0, "a b a"), (1, "b c"), (2, "c d"), (3, "   ")],
        "doc_id long, text string",
    )
    out = {r["bucket"]: r for r in vocab_growth(docs, bucket_size=2).collect()}
    assert out[0]["n_tokens"] == 5 and out[0]["new_types"] == 3
    assert out[1]["n_tokens"] == 2 and out[1]["new_types"] == 1
    assert out[1]["cum_tokens"] == 7 and out[1]["cum_types"] == 4
    assert out[0]["cum_tokens"] == 5 and out[0]["cum_types"] == 3


def test_vocab_growth_rejects_bad_bucket(spark):
    docs = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        vocab_growth(docs, bucket_size=0)


def test_eccentricity_path_graph(spark):
    # path 1-2-3-4-5: ecc(1)=4, ecc(3)=2; sum_dist(1)=1+2+3+4=10,
    # sum_dist(3)=1+1+2+2=6
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["seed"]: r for r in eccentricity_profile(edges, [1, 3]).collect()}
    assert out[1]["ecc"] == 4 and out[1]["n_reached"] == 4
    assert out[1]["sum_dist"] == 10
    assert out[3]["ecc"] == 2 and out[3]["sum_dist"] == 6


def test_eccentricity_truncation_is_lower_bound(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
    )
    out = {r["seed"]: r for r in eccentricity_profile(edges, [1], max_dist=2).collect()}
    assert out[1]["ecc"] == 2 and out[1]["n_reached"] == 2  # horizon-truncated


def test_eccentricity_isolated_seed_component(spark):
    # seed 10 in its own 2-cycle component: ecc 1, reaches only 11
    edges = spark.createDataFrame(
        [(1, 2), (10, 11)], "src long, dst long"
    )
    out = {r["seed"]: r for r in eccentricity_profile(edges, [10]).collect()}
    assert out[10]["ecc"] == 1 and out[10]["n_reached"] == 1
