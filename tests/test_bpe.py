"""BPE merge-training tests: equality with the textbook Sennrich greedy
loop (per-word scan) under the same tie-break, adversarial repeated-symbol
runs (where run-parity must equal greedy), and segmentation round-trip."""

from __future__ import annotations

from collections import Counter

from split_merge_partitioner_spark.functions.bpe import bpe_merges, bpe_segment


def _ref_bpe(word_counts: dict[str, int], n: int):
    vocab = {w: [ch for ch in w] for w in word_counts}
    merges = []
    for rank in range(1, n + 1):
        pairs: Counter = Counter()
        for w, syms in vocab.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            return merges, vocab
        (l, r), c = min(pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        merges.append((rank, l, r, c))
        for w, syms in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[w] = out
    return merges, vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _counts(texts):
    c: Counter = Counter()
    for t in texts:
        c.update(t.lower().split())
    return dict(c)


TEXTS = [
    "the cat sat on the mat",
    "the cats sat on the mats",
    "that hat is the best hat",
    "aaaa aaab baaa aa",  # repeated-symbol runs: parity vs greedy stress
    "banana bandana cabana",
]


def test_bpe_matches_textbook(spark):
    got = [tuple(r) for r in bpe_merges(_docs(spark, TEXTS), n_merges=10)
           .orderBy("rank").collect()]
    exp, _ = _ref_bpe(_counts(TEXTS), 10)
    assert got == exp


def test_bpe_pure_runs(spark):
    # single letter runs: (a,a) merges overlap maximally; greedy keeps the
    # odd matches of each run.  "aaaaa" -> aa aa a after merge 1
    texts = ["aaaaa aaaa aaa aa a"]
    got = [tuple(r) for r in bpe_merges(_docs(spark, texts), n_merges=3)
           .orderBy("rank").collect()]
    exp, vocab = _ref_bpe(_counts(texts), 3)
    assert got == exp
    seg = bpe_segment(_docs(spark, texts), [(l, r) for _, l, r, _ in exp])
    by_word: dict[str, list] = {}
    for row in seg.orderBy("word", "pos").collect():
        by_word.setdefault(row["word"], []).append(row["sym"])
    assert by_word == {w: syms for w, syms in vocab.items()}


def test_bpe_exhaustion_raises(spark):
    import pytest

    with pytest.raises(RuntimeError, match="exhausted"):
        bpe_merges(_docs(spark, ["ab ab"]), n_merges=5)


def test_bpe_segment_roundtrip(spark):
    merges_df = bpe_merges(_docs(spark, TEXTS), n_merges=8)
    merges = [(r["lhs"], r["rhs"]) for r in merges_df.orderBy("rank").collect()]
    seg = bpe_segment(_docs(spark, TEXTS), merges)
    rows = seg.collect()
    # concatenating a word's symbols reproduces the word, every token occurrence present
    by_key: dict[tuple, dict[int, str]] = {}
    for r in rows:
        by_key.setdefault((r["doc_id"], r["word"]), {})[r["pos"]] = r["sym"]
    for (_, word), syms in by_key.items():
        assert "".join(syms[i] for i in sorted(syms)) == word
    _, vocab = _ref_bpe(_counts(TEXTS), 8)
    # segmentation agrees with the textbook final vocab per word type
    for (_, word), syms in by_key.items():
        assert [syms[i] for i in sorted(syms)] == vocab[word]
