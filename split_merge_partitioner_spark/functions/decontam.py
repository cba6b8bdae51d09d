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

