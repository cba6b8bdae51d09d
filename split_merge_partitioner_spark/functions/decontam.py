"""Benchmark decontamination: flag training documents whose word n-grams
overlap an evaluation/benchmark corpus.

The standard guard in large-scale training-data pipelines (GPT-3 appendix C,
The Pile §6.3, Gopher §A2): before training, any document sharing enough
long word n-grams with a held-out benchmark is quarantined so downstream
eval numbers aren't contaminated.  The reference engine has no equivalent —
this belongs to the training-data-pipeline layer this engine adds on top of
the partitioner (same layer as dedup/sampling).

Everything is exact: gram construction is deterministic string slicing,
overlap counts are integers, and the single ratio is one ROUND()ed IEEE
division — so the DuckDB oracle hash-matches row for row.

Scale design: the benchmark side is DISTINCT word n-grams of the eval
corpus — millions of rows for real benchmark suites, i.e. broadcastable —
so the hot path is one scan of the training corpus, a per-document
array_distinct (no shuffle), an explode, and a broadcast hit-marker join;
the only exchange is the final groupBy(doc_id) count, which partial-
aggregates map-side.  Set ``broadcast_eval=False`` when the eval side is
genuinely huge and a shuffle hash join is the right plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _token_array, _word_ngrams


def ngram_contamination(
    train: DataFrame,
    eval_docs: DataFrame,
    n: int = 8,
    min_overlap: int = 1,
    text_col: str = "text",
    broadcast_eval: bool = True,
) -> DataFrame:
    """(doc_id, n_grams, n_hit_grams, contaminated_frac, is_contaminated)
    for every training document.

    ``n_hit_grams`` counts the training document's DISTINCT word
    ``n``-grams that appear anywhere in the eval corpus;
    ``is_contaminated`` is ``n_hit_grams >= min_overlap``.  GPT-3 used
    13-gram spans, The Pile 13-grams, Gopher 8-grams — ``n`` is the knob;
    the default follows Gopher.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    tr_grams = (
        train.select("doc_id", _token_array(text_col).alias("__toks__"))
        .select("doc_id", F.array_distinct(_word_ngrams("__toks__", n)).alias("grams"))
        .select(
            "doc_id",
            F.size("grams").cast("long").alias("n_grams"),
            # explode_outer keeps zero-gram docs as one null-gram row, so one
            # scan feeds both the total and the hit count
            F.explode_outer("grams").alias("gram"),
        )
    )
    ev = (
        eval_docs.select(_token_array(text_col).alias("__toks__"))
        .select(F.explode(_word_ngrams("__toks__", n)).alias("gram"))
        .distinct()
        .withColumn("__hit__", F.lit(1))
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr_grams.join(ev, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.max("n_grams").alias("n_grams"),
            F.coalesce(F.sum("__hit__"), F.lit(0)).cast("long").alias("n_hit_grams"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit_grams",
            F.round(
                F.col("n_hit_grams") / F.greatest(F.col("n_grams"), F.lit(1)), 6
            ).alias("contaminated_frac"),
            (F.col("n_hit_grams") >= min_overlap).alias("is_contaminated"),
        )
    )



def minhash_decontam(
    train: DataFrame,
    eval_docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 5,
    threshold: float = 0.4,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """FUZZY benchmark decontamination: training documents whose MinHash
    signature near-collides with any eval document — the modern complement
    of :func:`ngram_contamination`'s exact n-gram overlap (GPT-3's 13-gram
    filter generalized to Jaccard-similarity contamination, the approach
    most current decontamination pipelines layer on top of exact matching).

    Returns (doc_id, n_eval_matches, max_est_jaccard) for each CONTAMINATED
    training doc (>= 1 eval doc at est_jaccard >= threshold).

    Same portable signature family, band count, and threshold semantics as
    dedup.py::minhash_near_duplicates — the shared `_band_buckets` helper
    guarantees the banding cannot drift — but the candidate join is
    train x eval (LSH buckets on each side), so the shuffle is
    (|train| + |eval|) * bands rows and candidates are bounded by bucket
    co-occupancy, never the cross product.  At 10^12 training docs the
    eval side is tiny: its bucket relation broadcasts.
    """
    from pyspark.sql import functions as F

    from .dedup import _band_buckets, _minhash_udf

    assert num_hashes % bands == 0
    rows_per_band = num_hashes // bands
    udf = _minhash_udf(num_hashes, shingle_n, seed)
    sig_t = train.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("sig")
    ).persist()
    sig_e = eval_docs.select(
        F.col(id_col).alias("doc_id"), udf(F.col(text_col)).alias("sig")
    ).persist()
    try:
        bt = _band_buckets(sig_t, bands, rows_per_band, seed)
        be = _band_buckets(sig_e, bands, rows_per_band, seed).select(
            F.col("doc_id").alias("eid"), "band", "bh"
        )
        cand = (
            bt.join(F.broadcast(be), ["band", "bh"])
            .select(F.col("doc_id").alias("tid"), "eid")
            .distinct()
        )
        st = sig_t.select(F.col("doc_id").alias("tid"), F.col("sig").alias("sig_t"))
        se = sig_e.select(F.col("doc_id").alias("eid"), F.col("sig").alias("sig_e"))
        est = (
            cand.join(st, "tid")
            .join(F.broadcast(se), "eid")
            .select(
                "tid",
                "eid",
                F.round(
                    F.aggregate(
                        F.zip_with("sig_t", "sig_e", lambda x, y: (x == y).cast("int")),
                        F.lit(0),
                        lambda acc, v: acc + v,
                    ).cast("double")
                    / F.lit(float(num_hashes)),
                    6,
                ).alias("est_jaccard"),
            )
            .where(F.col("est_jaccard") >= threshold)
        )
        out = est.groupBy(F.col("tid").alias("doc_id")).agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_matches"),
            F.max("est_jaccard").alias("max_est_jaccard"),
        )
        # materialize so the persisted signatures can release here
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        sig_t.unpersist()
        sig_e.unpersist()
