"""Exact-substring span dedup and asymmetric containment detection.

Two verbatim-overlap operators the n-gram Jaccard / MinHash family can't
express:

- ``repeated_spans``: the ExactSubstr primitive of Lee et al.,
  "Deduplicating Training Data Makes Language Models Better" (ACL 2022) —
  for every document pair, every MAXIMAL run of tokens shared verbatim
  (length >= ``min_span``).  Where the suffix-array implementation sorts
  the concatenated corpus, the Spark-native plan is positional k-gram
  matching + diagonal run-merging: two documents share a t-token run
  (t >= k) iff they share t-k+1 CONSECUTIVE positional k-grams on one
  (pos_a - pos_b) diagonal, so maximal runs fall out of the classic
  gaps-and-islands trick (pos - row_number per diagonal) with zero
  iteration.

- ``containment_pairs``: asymmetric n-gram containment
  |grams(A) ∩ grams(B)| / |grams(A)| — the Broder containment coefficient.
  Jaccard misses a short document quoted inside a long one (union is
  dominated by the long side); containment is the quote/inclusion
  detector.

Scale shape (100 TB): everything is one positional-gram relation (one row
per corpus token — the same order as the tokenized corpus itself) and
hash joins on the gram string.  The quadratic hazard is boilerplate grams
shared by thousands of documents; ``df_cap`` drops grams whose document
frequency exceeds the cap BEFORE the self-join (the linkpred hub-cap
discipline), bounding per-gram fanout at df_cap^2 while leaving genuinely
rare verbatim overlaps exact.  Diagonal run-merging is a window over
(doc_a, doc_b, diagonal) — group cardinality is the number of matching
positions for ONE pair on ONE alignment, tiny by construction.  All
outputs are exact integers (positions, token counts, floor-ppm ratios):
the DuckDB oracle replays bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _token_array, _word_ngrams


def _positional_grams(docs: DataFrame, k: int, text_col: str) -> DataFrame:
    """(doc_id, pos, gram): 1-based token position of every word k-gram."""
    return (
        docs.select("doc_id", _token_array(text_col).alias("__toks__"))
        .select("doc_id", F.posexplode(_word_ngrams("__toks__", k)).alias("pos0", "gram"))
        .select("doc_id", (F.col("pos0") + 1).cast("long").alias("pos"), "gram")
    )


def repeated_spans(
    docs: DataFrame,
    k: int = 5,
    min_span: int = 10,
    df_cap: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Maximal verbatim token runs shared across document pairs.

    Returns (doc_a, doc_b, start_a, start_b, span_tokens): doc_a < doc_b,
    1-based token start positions, and the run length in tokens
    (>= ``min_span``).  A gram appearing at several positions yields one
    row per maximal alignment (each (pos_a - pos_b) diagonal merges
    independently), exactly the ExactSubstr match set restricted to runs
    >= min_span.

    ``k`` is the match granularity (runs shorter than k are invisible;
    min_span must be >= k).  ``df_cap`` bounds the join: grams seen in
    more than df_cap distinct documents are treated as boilerplate and
    excluded — documented, deterministic, and replayed by the oracle.
    """
    if min_span < k:
        raise ValueError(f"min_span ({min_span}) must be >= k ({k})")
    gp = _positional_grams(docs, k, text_col)

    # boilerplate cap: gram kept iff 2 <= document-frequency <= df_cap
    keep = (
        gp.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where((F.col("df") >= 2) & (F.col("df") <= F.lit(df_cap)))
        .select("gram")
    )
    gpk = gp.join(keep, "gram")

    a = gpk.select(
        F.col("doc_id").alias("doc_a"), F.col("pos").alias("pa"), "gram"
    )
    b = gpk.select(
        F.col("doc_id").alias("doc_b"), F.col("pos").alias("pb"), "gram"
    )
    m = a.join(b, "gram").where(F.col("doc_a") < F.col("doc_b")).select(
        "doc_a", "doc_b", "pa", "pb", (F.col("pa") - F.col("pb")).alias("diag")
    )

    # gaps-and-islands: consecutive pa on one diagonal share (pa - rn)
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pa")
    isl = m.withColumn("isl", F.col("pa") - F.row_number().over(w))
    return (
        isl.groupBy("doc_a", "doc_b", "diag", "isl")
        .agg(
            F.min("pa").alias("start_a"),
            F.min("pb").alias("start_b"),
            (F.max("pa") - F.min("pa") + F.lit(k)).cast("long").alias("span_tokens"),
        )
        .where(F.col("span_tokens") >= min_span)
        .select("doc_a", "doc_b", "start_a", "start_b", "span_tokens")
    )


def containment_pairs(
    docs: DataFrame,
    n: int = 5,
    threshold_ppm: int = 500_000,
    df_cap: int = 64,
    text_col: str = "text",
) -> DataFrame:
    """Documents mostly CONTAINED in another: (doc_id, container_id,
    n_grams, n_common, containment_ppm) for ordered pairs with
    containment(doc -> container) = 1e6 * |grams(doc) ∩ grams(container)|
    // |grams(doc)| >= threshold_ppm.

    Distinct word n-grams per document; the intersection join is capped
    by ``df_cap`` exactly as in :func:`repeated_spans` — a gram above the
    cap contributes to NEITHER the intersection NOR the per-doc gram
    count, so the ratio stays internally consistent (both sides of the
    division see the same capped gram universe).  Floor-ppm keeps the
    output integer-exact cross-engine.
    """
    g = (
        docs.select("doc_id", _token_array(text_col).alias("__toks__"))
        .select("doc_id", F.explode(F.array_distinct(_word_ngrams("__toks__", n))).alias("gram"))
    )
    keep = (
        g.groupBy("gram")
        .agg(F.count_distinct("doc_id").alias("df"))
        .where(F.col("df") <= F.lit(df_cap))
        .select("gram")
    )
    gk = g.join(keep, "gram")
    sizes = gk.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))

    a = gk.select(F.col("doc_id").alias("da"), "gram")
    b = gk.select(F.col("doc_id").alias("db"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("da") < F.col("db"))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    both = inter.select("da", "db", "n_common").unionAll(
        inter.select(F.col("db").alias("da"), F.col("da").alias("db"), "n_common")
    )
    out = (
        both.join(sizes.withColumnRenamed("doc_id", "da"), "da")
        .select(
            F.col("da").alias("doc_id"),
            F.col("db").alias("container_id"),
            F.col("n_grams").cast("long").alias("n_grams"),
            F.col("n_common").cast("long").alias("n_common"),
            F.expr("CAST(1000000 * n_common div n_grams AS BIGINT)").alias(
                "containment_ppm"
            ),
        )
        .where(F.col("containment_ppm") >= threshold_ppm)
    )
    return out
