"""repetition_stats (Gopher repetition signals) and ngram_contamination
(benchmark decontamination): exact Python replays on hand-built corpora,
edge cases, and the non-vacuity of the registered driver queries."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions import ngram_contamination, repetition_stats


def _py_grams(text: str, n: int) -> list[str]:
    toks = text.strip().lower().split()
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


DOCS = [
    (0, "a a a a a"),                      # maximally repetitive
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "x"),                              # single token: no 2-grams
    (3, ""),                               # empty
    (4, "  b  c  b c  "),                  # messy whitespace
    (5, "p q p q p q r"),                  # dominant 2-gram 'p q'
]


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_repetition_stats_exact_replay(spark, tiny):
    rows = {r["doc_id"]: r for r in repetition_stats(tiny, dup_n=2).collect()}
    assert set(rows) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        toks = text.strip().lower().split()
        r = rows[doc_id]
        assert r["n_tokens"] == len(toks)
        assert r["n_distinct_tokens"] == len(set(toks))
        g2 = _py_grams(text, 2)
        assert r["dup_total"] == len(g2)
        assert r["dup_distinct"] == len(set(g2))
        exp_frac = round((len(g2) - len(set(g2))) / max(len(g2), 1), 6)
        assert r["dup_frac"] == pytest.approx(exp_frac, abs=1e-9)
        if g2:
            c = Counter(g2)
            top = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
            assert (r["top2_gram"], r["top2_count"]) == top
            exp_cov = round(top[1] * len(top[0]) / max(len(text.strip()), 1), 6)
            assert r["top2_char_frac"] == pytest.approx(exp_cov, abs=1e-9)
        else:
            assert (r["top2_gram"], r["top2_count"], r["top2_char_frac"]) == ("", 0, 0.0)


def test_repetition_stats_signal_direction(spark, tiny):
    """The repetitive doc scores low ttr / high dup_frac vs natural text —
    the filtering decision Gopher actually makes."""
    rows = {r["doc_id"]: r for r in repetition_stats(tiny, dup_n=2).collect()}
    assert rows[0]["ttr"] < 0.3 < rows[1]["ttr"]
    assert rows[0]["dup_frac"] > 0.7 > rows[1]["dup_frac"]
    assert rows[5]["top2_gram"] == "p q" and rows[5]["top2_count"] == 3


def test_repetition_stats_dup_n_knob(spark, tiny):
    """dup_n changes the gram width: 'a a a a a' has 4 identical 2-grams but
    also 3 identical 3-grams; a 5-token doc has exactly one 5-gram."""
    r3 = {r["doc_id"]: r for r in repetition_stats(tiny, dup_n=3).collect()}
    assert (r3[0]["dup_total"], r3[0]["dup_distinct"]) == (3, 1)
    r5 = {r["doc_id"]: r for r in repetition_stats(tiny, dup_n=5).collect()}
    assert (r5[0]["dup_total"], r5[0]["dup_distinct"]) == (1, 1)
    assert r5[2]["dup_total"] == 0  # shorter than the window


def test_ngram_contamination_exact_replay(spark):
    train = spark.createDataFrame(
        [
            (10, "alpha beta gamma delta"),      # shares 'alpha beta gamma'
            (11, "beta gamma alpha epsilon"),    # shares nothing contiguous
            (12, "zz yy xx"),                    # disjoint vocab
            (13, "a b"),                         # too short for 3-grams
        ],
        "doc_id long, text string",
    )
    evald = spark.createDataFrame(
        [(99, "alpha beta gamma zeta")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in ngram_contamination(train, evald, n=3).collect()}
    ev_grams = set(_py_grams("alpha beta gamma zeta", 3))
    for doc_id, text in [(10, "alpha beta gamma delta"), (11, "beta gamma alpha epsilon"),
                         (12, "zz yy xx"), (13, "a b")]:
        grams = set(_py_grams(text, 3))
        r = out[doc_id]
        assert r["n_grams"] == len(grams)
        assert r["n_hit_grams"] == len(grams & ev_grams)
        assert r["is_contaminated"] == (len(grams & ev_grams) >= 1)
    assert out[10]["is_contaminated"] and not out[11]["is_contaminated"]
    assert out[13]["n_grams"] == 0 and not out[13]["is_contaminated"]


def test_ngram_contamination_distinct_grams_not_occurrences(spark):
    """A training doc repeating one contaminated gram 3 times counts it ONCE
    (distinct grams), so min_overlap thresholds measure breadth not volume."""
    train = spark.createDataFrame(
        [(1, "u v w u v w u v w")], "doc_id long, text string"
    )
    evald = spark.createDataFrame([(9, "u v w")], "doc_id long, text string")
    r = ngram_contamination(train, evald, n=3, min_overlap=2).collect()[0]
    assert r["n_hit_grams"] == 1  # 'u v w' hit once despite 3 occurrences
    assert not r["is_contaminated"]  # breadth 1 < min_overlap 2


def test_ngram_contamination_shuffle_join_path_identical(spark):
    """broadcast_eval=False (the genuinely-huge-eval-corpus plan) returns
    byte-identical results."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    train = docs.where(F.col("doc_id") % 50 != 0)
    evald = docs.where(F.col("doc_id") % 50 == 0)
    a = sorted(map(tuple, ngram_contamination(train, evald, n=3).collect()))
    b = sorted(
        map(tuple, ngram_contamination(train, evald, n=3, broadcast_eval=False).collect())
    )
    assert a == b and len(a) > 0


def test_registered_queries_non_vacuous(spark):
    """The driver-facing queries produce varied, non-degenerate signal on the
    synthetic corpus (guards against an all-zeros oracle 'match')."""
    import __spark_entry__ as entry

    qs = entry.queries()
    rep = qs["repetition_stats"](spark, "/root/testdata/sf0.001").collect()
    assert len({r["ttr"] for r in rep}) > 10
    assert any(r["dup_frac"] > 0 for r in rep)
    dec = qs["ngram_decontam"](spark, "/root/testdata/sf0.001").collect()
    flagged = sum(r["is_contaminated"] for r in dec)
    assert 0 < flagged < len(dec)


def test_near_duplicate_clusters_and_dedup_corpus(spark):
    """Identical-text groups cluster to their min id (signature equality
    guarantees pairing), singletons stay canonical, and dedup_corpus keeps
    exactly one full row per cluster.  (Transitive chaining through
    intermediate docs is the star-contraction CC's tested property.)"""
    from split_merge_partitioner_spark.functions import (
        dedup_corpus,
        near_duplicate_clusters,
    )

    t1 = "the quick brown fox jumps over the lazy dog again and again " * 3
    t2 = "completely different content about spark partitioning at scale " * 3
    rows = [(1, t1), (2, t1), (3, t1), (10, t2), (11, t2), (20, "unique tiny doc here")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["cluster"], r["is_canonical"])
        for r in near_duplicate_clusters(docs, threshold=0.4).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False), 20: (20, True),
    }
    kept = dedup_corpus(docs, threshold=0.4).orderBy("doc_id").collect()
    assert [r["doc_id"] for r in kept] == [1, 10, 20]
    assert kept[0]["text"] == t1  # payload columns survive the semi-join


def test_quality_filter_rules_and_reasons(spark):
    """Each rule fires on its designed violator; reasons keep the fixed
    order; the clean doc passes with an empty reasons string."""
    from split_merge_partitioner_spark.functions.pipeline import quality_filter

    good = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo "
        "lima mike november oscar papa quebec romeo sierra tango uniform victor "
        "whiskey xray yankee zulu amber birch cedar dogwood elm fig ginkgo "
        "hazel ironwood juniper"
    )  # 36 distinct tokens: passes length, ttr=1.0, no repeated 2-grams
    docs = spark.createDataFrame(
        [
            (0, good),                                   # keeps
            (1, "short doc"),                            # too_short (+len<100 quality hit)
            (2, ("dup dup " * 40).strip()),              # low_ttr + dup_ngrams + top_ngram
            (3, "1,2.3!4?5;6:7!" * 10),                  # punct+digit caps stack: 1-0.3-0.3 < 0.5
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], r["reasons"]) for r in quality_filter(docs).collect()}
    assert got[0] == (True, "")
    assert not got[1][0] and "too_short" in got[1][1]
    assert not got[2][0]
    assert got[2][1] == "low_ttr,dup_ngrams,top_ngram"  # fixed rule order
    assert not got[3][0] and "low_quality" in got[3][1]


def test_repetition_stats_rejects_bad_dup_n(spark, tiny):
    with pytest.raises(ValueError, match="dup_n"):
        repetition_stats(tiny, dup_n=0)
