"""bigram_coherence (functions/text.py): hand-computed fixed-point values
plus the discriminative property the signal exists for (fluent repetition
scores above rare-transition text)."""

from __future__ import annotations

from split_merge_partitioner_spark.functions import bigram_coherence


def test_bigram_coherence_hand_values(spark):
    # corpus: c_uni = {x:3, y:3, z:1}; c_big = {"x y":3, "y x":1, "y z":1}
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y z"), (3, ""), (4, "solo")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_coherence(docs).collect()}
    # doc 1: fp("x y")=3e6//3=1000000 twice, fp("y x")=1e6//3=333333
    assert got[1]["n_bigrams"] == 3
    assert got[1]["sum_fp"] == 1000000 + 333333 + 1000000
    assert got[1]["coherence_ppm"] == 2333333 // 3
    # doc 2: fp("x y")=1000000, fp("y z")=1e6//3=333333
    assert got[2]["n_bigrams"] == 2
    assert got[2]["sum_fp"] == 1333333
    assert got[2]["coherence_ppm"] == 1333333 // 2
    # empty / single-token docs: zero bigrams, zero score (no phantom grams)
    for d in (3, 4):
        assert got[d]["n_bigrams"] == 0
        assert got[d]["sum_fp"] == 0
        assert got[d]["coherence_ppm"] == 0


def test_bigram_coherence_ranks_fluent_above_shuffled(spark):
    # 20 documents repeating the same fluent phrase make its transitions
    # dominant; one scrambled doc reuses the same vocabulary with
    # transitions the corpus never repeats
    fluent = [(i, "the quick brown fox jumps over the lazy dog") for i in range(20)]
    scrambled = [(99, "dog the over fox lazy quick jumps brown the")]
    docs = spark.createDataFrame(fluent + scrambled, "doc_id long, text string")
    got = {r["doc_id"]: r["coherence_ppm"] for r in bigram_coherence(docs).collect()}
    assert got[0] > got[99]


def test_collocation_lift_hand_values(spark):
    from split_merge_partitioner_spark.functions.text import collocation_lift

    # grams: (x y) x3, (y x) x1, (y z) x1  ->  n = 5
    docs = spark.createDataFrame(
        [(1, "x y x y"), (2, "x y z")], "doc_id long, text string"
    )
    got = {(r["tok_a"], r["tok_b"]): r for r in collocation_lift(docs).collect()}
    assert list(got) == [("x", "y")]  # only pair with c_ab >= 2
    r = got[("x", "y")]
    # c_ab=3, c_a = x-as-first = 3, c_b = y-as-second = 3, n = 5
    assert (r["c_ab"], r["c_a"], r["c_b"], r["n_bigrams"]) == (3, 3, 3, 5)
    assert r["lift_ppm"] == (3 * 5 * 10**6) // (3 * 3)


def test_collocation_lift_ranks_fixed_phrase_top(spark):
    from split_merge_partitioner_spark.functions.text import collocation_lift

    docs = spark.createDataFrame(
        [(i, "alpha beta common common") for i in range(10)]
        + [(99, "common gamma common delta")],
        "doc_id long, text string",
    )
    rows = collocation_lift(docs).collect()
    by_lift = sorted(rows, key=lambda r: -r["lift_ppm"])
    assert (by_lift[0]["tok_a"], by_lift[0]["tok_b"]) == ("alpha", "beta")
