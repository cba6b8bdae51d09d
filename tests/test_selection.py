"""DSIR shift-selection tests: hand-computed ppm shifts on a planted
two-domain corpus, direction sanity, empty-target fail-fast."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.functions.selection import dsir_shift_select


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_dsir_hand_values(spark):
    # target tokens: {x: 2, y: 1} (tt=3); source adds doc 3 {z: 3} (ts=6)
    rows = [
        (1, "en", "x y"),
        (2, "en", "x"),
        (3, "de", "z z z"),
    ]
    out = {r.doc_id: r for r in dsir_shift_select(_docs(spark, rows)).collect()}
    # ppm_t: x=666666, y=333333, z=0; ppm_s: x=333333, y=166666, z=500000
    # doc1 = (666666-333333) + (333333-166666) = 500000
    assert (out[1].shift_score, out[1].selected) == (500_000, True)
    # doc2 = 333333
    assert (out[2].shift_score, out[2].n_tokens) == (333_333, 1)
    # doc3 = 3 * (0 - 500000)
    assert (out[3].shift_score, out[3].selected) == (-1_500_000, False)


def test_dsir_direction_on_mixed_doc(spark):
    rows = [
        (1, "en", "alpha beta alpha beta"),
        (2, "en", "alpha beta"),
        (3, "fr", "gamma delta gamma delta gamma delta"),
        (4, "fr", "alpha gamma"),  # mixed: one target-ish, one source-only
    ]
    out = {r.doc_id: r for r in dsir_shift_select(_docs(spark, rows)).collect()}
    assert out[1].selected and out[2].selected
    assert not out[3].selected
    # mixed doc: alpha pulls up, gamma pulls down harder (gamma heavier in src)
    assert out[4].shift_score < out[1].shift_score


def test_dsir_empty_target_raises(spark):
    with pytest.raises(ValueError, match="empty target"):
        dsir_shift_select(_docs(spark, [(1, "de", "a b")]), target_value="xx")
