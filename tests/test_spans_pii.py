"""Planted-fixture tests for exact-substring spans, containment, and PII."""

from __future__ import annotations

from split_merge_partitioner_spark.functions import (
    containment_pairs,
    pii_rates,
    pii_stats,
    redact_pii,
    repeated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_repeated_spans_finds_planted_run(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(
        spark,
        [
            (1, "intro words " + shared + " tail one", "s"),
            (2, "other prefix tokens here " + shared + " closing", "s"),
            (3, "no overlap with anything at all whatsoever", "s"),
        ],
    )
    out = repeated_spans(docs, k=5, min_span=10).collect()
    assert len(out) == 1
    r = out[0]
    # doc 1: 2 intro tokens -> shared starts at token 3; doc 2: 4 -> 5
    assert (r.doc_a, r.doc_b, r.start_a, r.start_b, r.span_tokens) == (1, 2, 3, 5, 10)


def test_repeated_spans_merges_maximal_run_not_fragments(spark):
    # a 12-token shared run must yield ONE span of 12, not 8 5-gram matches
    shared = " ".join(f"w{i}" for i in range(12))
    docs = _docs(spark, [(1, shared, "s"), (2, "x y " + shared, "s")])
    out = repeated_spans(docs, k=5, min_span=5).collect()
    assert len(out) == 1
    assert out[0].span_tokens == 12
    assert (out[0].start_a, out[0].start_b) == (1, 3)


def test_repeated_spans_two_alignments_two_rows(spark):
    # the same 5-token phrase appears TWICE in doc 2 -> two diagonals
    phrase = "p q r s t"
    docs = _docs(
        spark,
        [(1, "a b " + phrase + " c", "s"), (2, phrase + " mid tokens " + phrase, "s")],
    )
    out = sorted(
        repeated_spans(docs, k=5, min_span=5).collect(), key=lambda r: r.start_b
    )
    assert len(out) == 2
    assert [r.start_b for r in out] == [1, 8]
    assert all(r.span_tokens == 5 and r.start_a == 3 for r in out)


def test_repeated_spans_df_cap_drops_boilerplate(spark):
    boiler = "this footer appears on every single page verbatim always"
    docs = _docs(spark, [(i, f"doc {i} body " + boiler, "s") for i in range(1, 6)])
    capped = repeated_spans(docs, k=5, min_span=5, df_cap=3).collect()
    assert capped == []
    uncapped = repeated_spans(docs, k=5, min_span=5, df_cap=100).collect()
    assert len(uncapped) == 10  # all C(5,2) pairs share the run


def test_repeated_spans_min_span_validation(spark):
    docs = _docs(spark, [(1, "a b c", "s")])
    try:
        repeated_spans(docs, k=5, min_span=3)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_containment_detects_quote_jaccard_misses(spark):
    short = " ".join(f"q{i}" for i in range(10))
    long_doc = " ".join(f"f{i}" for i in range(200)) + " " + short
    docs = _docs(spark, [(1, short, "s"), (2, long_doc, "s")])
    out = containment_pairs(docs, n=5, threshold_ppm=900_000).collect()
    # doc 1 fully contained in doc 2 (all 6 of its 5-grams appear there)
    assert len(out) == 1
    r = out[0]
    assert (r.doc_id, r.container_id, r.containment_ppm) == (1, 2, 1_000_000)
    # the reverse direction is way below threshold (long doc barely overlaps)
    assert r.n_grams == 6 and r.n_common == 6


def test_pii_stats_and_redact(spark):
    docs = _docs(
        spark,
        [
            (1, "contact me at jane.doe+spam@example.co.uk or call +1 (555) 123-4567", "a"),
            (2, "server at 192.168.10.254 responded", "a"),
            (3, "perfectly clean prose with no identifiers", "b"),
        ],
    )
    got = {r.doc_id: r for r in pii_stats(docs).collect()}
    assert got[1].n_emails == 1 and got[1].n_phones == 1 and got[1].has_pii
    assert got[2].n_ipv4 == 1 and got[2].has_pii
    assert not got[3].has_pii and got[3].n_emails == got[3].n_phones == 0

    red = {r.doc_id: r.redacted for r in redact_pii(docs).collect()}
    assert "[EMAIL]" in red[1] and "jane.doe" not in red[1]
    assert "[PHONE]" in red[1] and "555" not in red[1]
    assert "[IPV4]" in red[2] and "192.168" not in red[2]
    assert red[3] == "perfectly clean prose with no identifiers"

    rates = {r.source: r for r in pii_rates(docs).collect()}
    assert rates["a"].n_docs_with_pii == 2 and rates["a"].total_emails == 1
    assert rates["b"].n_docs_with_pii == 0
