"""Sequence packing: coverage/contiguity invariants + hand-checked spans."""

from __future__ import annotations

from split_merge_partitioner_spark.functions.pipeline import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_pack_hand_example(spark):
    # tokens: d1=3, d2=4, d3=2 in source s; context 4
    docs = _docs(spark, [
        (1, "a b c", "s"),
        (2, "d e f g", "s"),
        (3, "h i", "s"),
    ])
    rows = sorted(
        pack_sequences(docs, context_len=4).collect(),
        key=lambda r: (r.bin, r.bin_from),
    )
    got = [(r.bin, r.doc_id, r.doc_from, r.doc_to, r.bin_from) for r in rows]
    # stream: [a b c | d] [e f g | h] [i]
    assert got == [
        (0, 1, 0, 3, 0),
        (0, 2, 0, 1, 3),
        (1, 2, 1, 4, 0),
        (1, 3, 0, 1, 3),
        (2, 3, 1, 2, 0),
    ]


def test_pack_invariants_random(spark):
    import random

    rng = random.Random(4)
    rows = []
    for d in range(40):
        n = rng.randrange(1, 30)
        rows.append((d, " ".join(f"t{j}" for j in range(n)), f"s{d % 3}"))
    docs = _docs(spark, rows)
    out = pack_sequences(docs, context_len=16).collect()
    tok = {r[0]: len(r[1].split()) for r in rows}
    # every token of every doc covered exactly once, slices contiguous
    per_doc = {}
    for r in out:
        per_doc.setdefault(r.doc_id, []).append((r.doc_from, r.doc_to))
        assert 0 <= r.bin_from and r.bin_from + (r.doc_to - r.doc_from) <= 16
    for d, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0 and spans[-1][1] == tok[d]
        for (a, b), (c, e) in zip(spans, spans[1:]):
            assert b == c
    # bins are filled with no overlap within each group
    fill = {}
    for r in out:
        key = (r.group, r.bin)
        fill.setdefault(key, []).append((r.bin_from, r.bin_from + r.doc_to - r.doc_from))
    for key, iv in fill.items():
        iv.sort()
        for (a, b), (c, e) in zip(iv, iv[1:]):
            assert b == c, (key, iv)
        assert iv[0][0] == 0
        # every bin except a group's last is exactly full
    for g in {r.group for r in out}:
        bins = sorted(b for gg, b in fill if gg == g)
        for b in bins[:-1]:
            assert sum(e - a for a, e in fill[(g, b)]) == 16


def test_pack_validation_and_empty_docs(spark):
    docs = _docs(spark, [(1, "", "s"), (2, "x y", "s")])
    out = pack_sequences(docs, context_len=8).collect()
    assert [(r.doc_id, r.doc_from, r.doc_to) for r in out] == [(2, 0, 2)]
    try:
        pack_sequences(docs, context_len=0)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
