"""Prefix-filtered Jaccard join ≡ the naive threshold join (lossless pruning)."""

from __future__ import annotations

import random

from split_merge_partitioner_spark.functions.dedup import (
    jaccard_join_prefix,
    ngram_jaccard_pairs,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _rand_corpus(seed, n_docs=30):
    rng = random.Random(seed)
    vocab = [f"w{j}" for j in range(25)]
    base = " ".join(rng.choice(vocab) for _ in range(40))
    texts = []
    for d in range(n_docs):
        if d % 3 == 0:  # perturbed near-dups of base
            toks = base.split()
            for _ in range(rng.randrange(0, 6)):
                toks[rng.randrange(len(toks))] = rng.choice(vocab)
            texts.append(" ".join(toks))
        else:
            texts.append(" ".join(rng.choice(vocab) for _ in range(rng.randrange(20, 50))))
    return texts


def test_prefix_join_equals_naive_join(spark):
    for seed in (1, 8):
        docs = _docs(spark, _rand_corpus(seed))
        fast = sorted(
            map(tuple, jaccard_join_prefix(docs, n=5, threshold_ppm=400_000).collect())
        )
        naive = sorted(
            map(tuple, ngram_jaccard_pairs(docs, n=5, threshold=0.4).collect())
        )
        assert fast == naive and len(fast) > 0, seed


def test_prefix_join_high_threshold_exactness(spark):
    # t = 0.9: prefixes are tiny (|S| - ceil(.9|S|) + 1); identical docs must
    # still be found (jaccard 1.0), sub-threshold near-dups must not
    docs = _docs(spark, ["the same exact text here okay",
                         "the same exact text here okay",
                         "the same exact text here okay but longer now"])
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in jaccard_join_prefix(docs, threshold_ppm=900_000).collect()}
    assert got == {(0, 1): 1.0}
