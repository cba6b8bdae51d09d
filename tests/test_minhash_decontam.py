"""Fuzzy minhash decontamination: planted contamination, split semantics."""

from __future__ import annotations

from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions.decontam import minhash_decontam


def test_minhash_decontam_flags_planted_near_dup(spark):
    base = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight while everyone sleeps")
    docs = spark.createDataFrame(
        [
            (0, base, "s"),                                   # eval (id % 50 == 0)
            (1, base.replace("lazy", "sleepy"), "s"),         # contaminated train
            (2, "completely unrelated text about spark partitioning engines "
                "and shuffle exchanges with zero shared shingles here", "s"),
        ],
        "doc_id long, text string, source string",
    )
    train = docs.where(F.col("doc_id") % 50 != 0)
    ev = docs.where(F.col("doc_id") % 50 == 0)
    got = {r.doc_id: r for r in minhash_decontam(train, ev, threshold=0.4).collect()}
    assert set(got) == {1}
    assert got[1].n_eval_matches == 1 and got[1].max_est_jaccard >= 0.4


def test_minhash_decontam_empty_when_no_overlap(spark):
    docs = spark.createDataFrame(
        [(0, "aaaa bbbb cccc dddd eeee ffff gggg hhhh iiii jjjj", "s"),
         (1, "zzzz yyyy xxxx wwww vvvv uuuu tttt ssss rrrr qqqq", "s")],
        "doc_id long, text string, source string",
    )
    out = minhash_decontam(
        docs.where(F.col("doc_id") == 1), docs.where(F.col("doc_id") == 0)
    ).collect()
    assert out == []
