"""End-to-end corpus preparation: each stage's effect visible in the output."""

from __future__ import annotations

from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions.pipeline import prepare_training_corpus


def test_prepare_corpus_stages_compose(spark):
    good = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(14))   # varied
    leak = " ".join(f"bench{i} answer{i} secret{i}" for i in range(14))
    docs = spark.createDataFrame(
        [
            (1, good, "s"),
            (2, good, "s"),                  # exact dup of 1 -> dropped
            (3, "short junk", "s"),          # fails quality gate
            (4, leak, "s"),                  # contaminated vs eval
            (5, " ".join(f"delta{i} omega{i} sigma{i}" for i in range(14)), "s"),
        ],
        "doc_id long, text string, source string",
    )
    ev = spark.createDataFrame([(100, leak, "e")], "doc_id long, text string, source string")
    out = prepare_training_corpus(docs, ev, context_len=16)
    surv = {r.doc_id for r in out.select("doc_id").distinct().collect()}
    assert surv == {1, 5}
    # packing invariants on the survivors: full coverage, contiguous slices
    per_doc = {}
    for r in out.collect():
        per_doc.setdefault(r.doc_id, []).append((r.doc_from, r.doc_to))
    for d, spans in per_doc.items():
        spans.sort()
        assert spans[0][0] == 0
        for (a, b), (c, e) in zip(spans, spans[1:]):
            assert b == c


def test_prepare_corpus_dedup_runs_after_gate(spark):
    # the ONLY clean copy of a text must survive even when a junk copy of
    # the same text has a smaller doc_id (dedup before the gate would pick
    # the junk keeper and lose the text entirely)
    clean = " ".join(f"word{i} token{i} item{i}" for i in range(14))
    docs = spark.createDataFrame(
        [(1, clean + " !!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!!", "s"),  # junk twin
         (2, clean, "s")],
        "doc_id long, text string, source string",
    )
    ev = spark.createDataFrame([(9, "unrelated eval", "e")],
                               "doc_id long, text string, source string")
    out = prepare_training_corpus(docs, ev, context_len=32)
    assert {r.doc_id for r in out.select("doc_id").distinct().collect()} == {2}
