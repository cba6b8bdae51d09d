"""bm25_topk: exact Python replay of the fixed-point BM25 ranking (floor-ppm
per term with Fraction arithmetic), tie-break determinism, monotonicity
sanity, validations."""

from __future__ import annotations

from fractions import Fraction

import pytest

from split_merge_partitioner_spark.functions.search import bm25_topk


def _py_bm25(rows, terms, k):
    terms = sorted({t.strip().lower() for t in terms if t.strip()})
    toks = {i: (t.strip().lower().split() if t.strip() else []) for i, t in rows}
    n = len(toks)
    total = sum(len(v) for v in toks.values())
    dfreq = {t: sum(1 for v in toks.values() if t in v) for t in terms}
    scores = {}
    for i, v in toks.items():
        s, m = 0, 0
        for t in terms:
            tf = v.count(t)
            if tf == 0:
                continue
            m += 1
            df = dfreq[t]
            idf = Fraction(2 * n - 2 * df + 1, 2 * df + 1)
            tfn = Fraction(22 * tf * total, 10 * total * tf + 3 * total + 9 * len(v) * n)
            s += (1_000_000 * idf * tfn).__floor__()
        if m:
            scores[i] = (m, s)
    order = sorted(scores, key=lambda i: (-scores[i][1], i))[:k]
    return [(i, scores[i][0], scores[i][1], r + 1) for r, i in enumerate(order)]


DOCS = [
    (1, "spark join join join merge sort"),
    (2, "join merge"),
    (3, "the quick brown fox"),
    (4, "join " * 30 + "filler " * 100),
    (5, ""),
    (6, "merge sort merge sort merge"),
    (7, "spark"),
    (8, "spark spark spark join"),
]


@pytest.mark.parametrize(
    "terms,k",
    [(["join", "merge"], 5), (["spark"], 3), (["JOIN", "spark ", "zzz"], 8)],
)
def test_bm25_exact_replay(spark, terms, k):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = [
        (r["doc_id"], r["n_terms"], r["score_ppm"], r["rank"])
        for r in bm25_topk(df, terms, k=k).orderBy("rank").collect()
    ]
    assert got == _py_bm25(DOCS, terms, k), (terms, k)


def test_bm25_saturation_and_norm(spark):
    # tf saturation: tripling an already-present term must gain < 3x the
    # per-term score; length normalization: same tf in a longer doc scores
    # lower
    rows = [
        (1, "join alpha beta"),
        (2, "join join join alpha beta"),
        (3, "join " + "pad " * 40),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    s = {r["doc_id"]: r["score_ppm"] for r in bm25_topk(df, ["join"], k=10).collect()}
    assert s[2] < 3 * s[1]
    assert s[3] < s[1]


def test_bm25_corpus_query(spark):
    # the documents fixture: deterministic top-k, ranks contiguous from 1,
    # scores non-increasing, ties broken by doc_id
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = bm25_topk(docs, ["spark", "join", "merge"], k=15).orderBy("rank").collect()
    assert len(out) == 15
    assert [r["rank"] for r in out] == list(range(1, 16))
    for a, b in zip(out, out[1:]):
        assert (a["score_ppm"], -a["doc_id"]) >= (b["score_ppm"], -b["doc_id"])


def test_bm25_validations(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, ["  ", ""])
    with pytest.raises(ValueError):
        bm25_topk(df, ["x"], k=0)
