"""Byte-pair-encoding merge training (Sennrich, Haddow & Birch, ACL 2016 —
the tokenizer-training loop behind GPT-2/RoBERTa vocabularies), distributed
and cross-engine exact.

Classic BPE: start from the character-split word vocabulary (weighted by
corpus frequency), repeatedly (1) count all adjacent symbol pairs, (2) take
the most frequent pair, (3) merge its occurrences greedily left-to-right in
every word.  The merge TABLE (rank-ordered pairs) is the trained artifact;
applying it reproduces the tokenizer.

Determinism: the argmax pair is tie-broken (count DESC, lhs ASC, rhs ASC) —
binary string order, identical in Spark and DuckDB on this corpus — so the
whole merge sequence is a pure function of the corpus.

The greedy-merge step is inherently sequential per word in the textbook
formulation; here it is VECTORIZED exactly: a match at position p means
(sym[p], sym[p+1]) = (L, R), so two matches at CONSECUTIVE positions force
R = L — i.e. overlapping matches only occur inside runs of one repeated
symbol, and greedy left-to-right keeps exactly the ODD (1st, 3rd, ...)
matches of each maximal consecutive-match run.  That "run parity" rule is
two window functions (run id = pos - row_number, then row_number % 2),
replayable bit-for-bit in SQL — no per-row Python, no fold.

Scale shape: state is the positions relation (one row per symbol occurrence
in the VOCABULARY — vocab size x avg word length, NOT corpus size; the
corpus is touched once for the word counts).  Each merge round is windows
+ joins hash-partitioned by word, one scalar 1-row collect for the argmax
(the hits.py constant-size guard class), with per-round relations
localCheckpointed and released.  Rounds = n_merges by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..storage import release
from .text import _token_array


def bpe_merges(
    docs: DataFrame,
    n_merges: int = 12,
    text_col: str = "text",
) -> DataFrame:
    """Train ``n_merges`` BPE merges on the corpus; returns the rank-ordered
    merge table (rank, lhs, rhs, pair_count) — rank from 1, pair_count the
    weighted adjacent-pair frequency at selection time.

    Raises RuntimeError if the vocabulary runs out of adjacent pairs before
    ``n_merges`` (every word fully merged) — fail-fast rather than a short
    table the caller did not ask for.
    """
    spark = docs.sparkSession
    vocab = (
        docs.select(F.explode(_token_array(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    pos = vocab.select(
        "word",
        "cnt",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("p0", "sym"),
    ).select(
        "word", "cnt", (F.col("p0") + 1).cast("long").alias("pos"), "sym"
    ).localCheckpoint(eager=True)

    w_word = Window.partitionBy("word").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    try:
        for rank in range(1, n_merges + 1):
            pr = pos.withColumn("nxt", F.lead("sym").over(w_word))
            best = (
                pr.where(F.col("nxt").isNotNull())
                .groupBy(F.col("sym").alias("lhs"), F.col("nxt").alias("rhs"))
                .agg(F.sum("cnt").cast("long").alias("c"))
                .orderBy(F.desc("c"), "lhs", "rhs")
                .limit(1)
                .collect()  # constant-size: exactly one row per round
            )
            if not best:
                raise RuntimeError(
                    f"vocabulary exhausted after {rank - 1} merges (< {n_merges})"
                )
            lhs, rhs, c = best[0]["lhs"], best[0]["rhs"], int(best[0]["c"])
            merges.append((rank, lhs, rhs, c))
            m = pr.where((F.col("sym") == lhs) & (F.col("nxt") == rhs)).select(
                "word", "pos", F.row_number().over(w_word).alias("rn")
            )
            kept = (
                m.withColumn(
                    "k",
                    F.row_number().over(
                        Window.partitionBy("word", F.col("pos") - F.col("rn")).orderBy(
                            "pos"
                        )
                    ),
                )
                .where(F.col("k") % 2 == 1)
                .select("word", "pos")
            )
            k1 = kept.withColumn("is_kept", F.lit(True))
            k2 = kept.select(
                "word", (F.col("pos") + 1).alias("pos"), F.lit(True).alias("consumed")
            )
            new_pos = (
                pos.join(k1, ["word", "pos"], "left")
                .join(k2, ["word", "pos"], "left")
                .where(F.col("consumed").isNull())
                .select(
                    "word",
                    "cnt",
                    F.row_number().over(w_word).cast("long").alias("pos"),
                    F.when(F.col("is_kept"), F.lit(lhs + rhs))
                    .otherwise(F.col("sym"))
                    .alias("sym"),
                )
                .localCheckpoint(eager=True)
            )
            release(pos)
            pos = new_pos
    finally:
        release(pos)
    return spark.createDataFrame(
        merges, "rank long, lhs string, rhs string, pair_count long"
    )


def bpe_segment(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a trained merge list to the corpus: (doc_id, word, sym, pos)
    symbol segmentation of every token occurrence's word type, replaying the
    merges in rank order with the same run-parity rule.  Distinct word types
    are segmented once and the result is joined back — the corpus-size
    explode never passes through the merge rounds."""
    spark = docs.sparkSession
    toks = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_token_array(text_col)).alias("word")
    )
    types = toks.select("word").distinct()
    pos = types.select(
        "word",
        F.posexplode(
            F.expr("transform(sequence(1, length(word)), i -> substring(word, i, 1))")
        ).alias("p0", "sym"),
    ).select("word", (F.col("p0") + 1).cast("long").alias("pos"), "sym").localCheckpoint(
        eager=True
    )
    w_word = Window.partitionBy("word").orderBy("pos")
    try:
        for lhs, rhs in merges:
            pr = pos.withColumn("nxt", F.lead("sym").over(w_word))
            m = pr.where((F.col("sym") == lhs) & (F.col("nxt") == rhs)).select(
                "word", "pos", F.row_number().over(w_word).alias("rn")
            )
            kept = (
                m.withColumn(
                    "k",
                    F.row_number().over(
                        Window.partitionBy("word", F.col("pos") - F.col("rn")).orderBy(
                            "pos"
                        )
                    ),
                )
                .where(F.col("k") % 2 == 1)
                .select("word", "pos")
            )
            k1 = kept.withColumn("is_kept", F.lit(True))
            k2 = kept.select(
                "word", (F.col("pos") + 1).alias("pos"), F.lit(True).alias("consumed")
            )
            new_pos = (
                pos.join(k1, ["word", "pos"], "left")
                .join(k2, ["word", "pos"], "left")
                .where(F.col("consumed").isNull())
                .select(
                    "word",
                    F.row_number().over(w_word).cast("long").alias("pos"),
                    F.when(F.col("is_kept"), F.lit(lhs + rhs))
                    .otherwise(F.col("sym"))
                    .alias("sym"),
                )
                .localCheckpoint(eager=True)
            )
            release(pos)
            pos = new_pos
        out = toks.join(pos, "word").select("doc_id", "word", "pos", "sym")
        # materialize before releasing the final positions relation
        out = out.localCheckpoint(eager=True)
    finally:
        release(pos)
    return out
