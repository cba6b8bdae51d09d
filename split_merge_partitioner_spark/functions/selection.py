"""Data-selection scoring — DSIR-style importance shift (Xie et al.,
"Data Selection for Language Models via Importance Resampling", NeurIPS
2023), integer-exact variant.

DSIR scores every raw document by how much more likely it is under a
TARGET unigram model (the high-quality / in-domain slice) than under the
SOURCE model (the whole raw corpus) and keeps the top mass.  The published
recipe uses log-likelihood ratios over hashed n-gram features; floats and
ln() are not cross-engine replayable, so this operator uses the LINEAR
shift: per token occurrence, the difference of exact floor-ppm unigram
masses

    shift(doc) = Σ_tokens ( ppm_target(tok) − ppm_source(tok) )

which preserves the decision direction (positive ⇔ the doc's vocabulary
leans toward the target distribution) while staying pure BIGINT — the
DuckDB oracle hash-matches.  ``selected`` = shift > 0.

Scale shape: two map-side-combined groupBys build the two unigram tables
(vocabulary-sized, NOT corpus-sized); one hash join of the token stream
against the merged vocab (broadcast when the vocab fits, hash otherwise)
and one per-doc aggregate — three exchanges end to end.  At web scale
hash tokens into 2^20 buckets first (the published recipe) to bound the
vocab relation; the fixture vocabulary is exact-counted instead, which
only sharpens the estimator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import _token_array


def dsir_shift_select(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_tokens, shift_score, selected) for every document.

    Raises ValueError when the target slice is empty (no model to aim at).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(target_col) == target_value).alias("is_target"),
        F.explode(_token_array(text_col)).alias("tok"),
    )
    tgt = toks.where("is_target").groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    src = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("cs"))
    tot = tgt.agg(F.sum("ct").alias("tt")).crossJoin(
        src.agg(F.sum("cs").alias("ts"))
    )
    row = tot.collect()  # two scalars
    if not row or row[0]["tt"] is None or row[0]["tt"] == 0:
        raise ValueError(
            f"dsir_shift_select: empty target slice {target_col}={target_value!r}"
        )
    tt, ts = int(row[0]["tt"]), int(row[0]["ts"])
    vocab = src.join(tgt, "tok", "left").select(
        "tok",
        (
            F.expr(f"coalesce(ct, 0) * 1000000 div {tt}")
            - F.expr(f"cs * 1000000 div {ts}")
        ).cast("long").alias("dppm"),
    )
    return (
        toks.join(vocab, "tok")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("dppm").cast("long").alias("shift_score"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "shift_score",
            (F.col("shift_score") > 0).alias("selected"),
        )
    )
