"""langid_confusion + CUSUM changepoint detector (windowed max-reset identity)."""

from __future__ import annotations

from datetime import datetime, timedelta

from split_merge_partitioner_spark.functions.events import cusum_changepoints
from split_merge_partitioner_spark.functions.text import langid_confusion


def test_langid_confusion_diagonal_and_unk(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house", "en"),
            (2, "der hund und der mann nicht da", "de"),
            (3, "le chat et les chiens", "fr"),
            (4, "totally markerless gibberish xyzzy", "zh"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {(r.lang, r.lang_pred): (r.n_docs, r.row_frac_ppm)
           for r in langid_confusion(docs).collect()}
    assert got[("en", "en")] == (1, 1_000_000)
    assert got[("de", "de")] == (1, 1_000_000)
    assert got[("fr", "fr")] == (1, 1_000_000)
    assert got[("zh", "unk")] == (1, 1_000_000)


def _stream(spark, per_bucket):
    # per_bucket: list of event counts per hour bucket for type "a"
    rows, eid = [], 0
    t0 = datetime(2024, 1, 1)
    for b, n in enumerate(per_bucket):
        for j in range(n):
            rows.append((eid, t0 + timedelta(hours=b, minutes=j % 50), 1, "a", 0.0, ""))
            eid += 1
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )


def test_cusum_matches_sequential_recurrence_and_alarms(spark):
    per_bucket = [2] * 20 + [9] * 10   # rate shift at bucket 20
    ev = _stream(spark, per_bucket)
    out = sorted(cusum_changepoints(ev).collect(), key=lambda r: r.bucket)
    assert len(out) == 30
    n, nb = sum(per_bucket), len(per_bucket)
    k = n // nb
    # hand recurrence C_t = max(0, C_{t-1} + x - k)
    c, expected = 0, []
    for x_val in per_bucket:
        c = max(0, c + x_val - k)
        expected.append(c)
    assert [r.cusum for r in out] == expected
    alarms = [r.bucket - out[0].bucket for r in out if r.is_alarm]
    assert alarms and min(alarms) >= 20  # fires only after the shift
    assert all(not r.is_alarm for r in out[:20])


def test_cusum_densifies_empty_buckets(spark):
    per_bucket = [3, 0, 0, 3, 0, 3]  # two empty gaps
    ev = _stream(spark, [n for n in per_bucket])
    out = sorted(cusum_changepoints(ev).collect(), key=lambda r: r.bucket)
    assert [r.n_events for r in out] == [3, 0, 0, 3, 0, 3]
