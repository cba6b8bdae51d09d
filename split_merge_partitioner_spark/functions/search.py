"""BM25 keyword search over the corpus — exact fixed-point scoring, so the
ranking (not just the hit set) is bit-identical cross-engine.

BM25 (Robertson & Walker, SIGIR'94; k1 = 6/5, b = 3/4 — the classic
defaults as exact rationals) with the LINEAR idf variant this engine uses
everywhere floats would otherwise flake (`text.py::tfidf_top_terms`):

    idf(t)        = (N - df + 1/2) / (df + 1/2) = (2N - 2df + 1)/(2df + 1)
    tfnorm(t, d)  = tf·(k1+1) / (tf + k1·(1 - b + b·len·N/L))
    score(q, d)   = Σ_t  floor( 1e6 · idf(t) · tfnorm(t, d) )      [ppm]

With L = Σ len (total corpus tokens, so avglen = L/N) everything clears to
one integer fraction per (doc, term):

    num = (2N − 2df + 1) · 22 · tf · L
    den = (2df + 1) · (10·L·tf + 3·L + 9·len·N)

(k1·(1−b) = 3/10 and k1·b = 9/10 over a common ×10L; tf·(k1+1)·10L =
22·tf·L.)  Products run in
DECIMAL(38,0) (HUGEINT in the oracle) — the outlier_events/semdedup
discipline — and the floor division is made EXACT in decimal arithmetic by
subtracting the remainder first: floor(a/b) = (a − a mod b)/b, a division
with a zero remainder that no rounding mode can disturb.  Per-term ppm
scores are then plain BIGINTs and the doc score is their sum.

Plan shape: one tokenizing projection over the document scan feeds BOTH
the per-doc length aggregate and the exploded term-frequency leg; the term
filter (`isin` on the query terms) lands BEFORE the explode's groupBy, so
the per-(doc, term) exchange carries only query-term hits — at 100 TB the
tf relation is |query| · |matching docs|, never corpus-sized.  df and the
(N, L) corpus scalars ride broadcast joins (df: ≤ |query| rows; stats: 1
row).  Top-k is one window over the scored docs (score DESC, doc_id ASC —
deterministic ties).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import _token_array

_D = "decimal(38,0)"


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_terms, score_ppm, rank) — top-``k`` documents by exact
    fixed-point BM25 over ``query_terms`` (lowercased, deduped); ties
    broken by doc id.  Documents matching no term never appear."""
    terms = sorted({t.strip().lower() for t in query_terms if t.strip()})
    if not terms:
        raise ValueError("bm25_topk needs at least one non-empty query term")
    if k < 1:
        raise ValueError("k must be >= 1")
    toks = docs.select(F.col(id_col).alias("doc_id"), _token_array(text_col).alias("t"))
    dlen = toks.select("doc_id", F.size("t").cast("long").alias("len"))
    stats = dlen.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("len"), F.lit(0)).cast("long").alias("total_len"),
    )
    tf = (
        toks.select("doc_id", F.explode("t").alias("term"))
        .where(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))

    def d(c):
        return c.cast(_D)

    j = tf.join(F.broadcast(dfreq), "term").join(dlen, "doc_id").crossJoin(
        F.broadcast(stats)
    )
    # every multi-factor product is assembled IN decimal (the long inputs
    # are only ever used once per factor), so no int64 intermediate exists
    # to overflow at corpus scale
    num = (
        d(F.lit(2) * F.col("n_docs") - F.lit(2) * F.col("df") + F.lit(1))
        * d(F.lit(22)) * d(F.col("tf"))
        * d(F.col("total_len"))
        * d(F.lit(1_000_000))
    )
    den = d(F.lit(2) * F.col("df") + F.lit(1)) * (
        d(F.lit(10)) * d(F.col("total_len")) * d(F.col("tf"))
        + d(F.lit(3)) * d(F.col("total_len"))
        + d(F.lit(9)) * d(F.col("len")) * d(F.col("n_docs"))
    )
    term_ppm = ((num - F.pmod(num, den)) / den).cast("long")
    scored = (
        j.select("doc_id", term_ppm.alias("ppm"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_terms"),
            F.sum("ppm").cast("long").alias("score_ppm"),
        )
    )
    w = Window.orderBy(F.desc("score_ppm"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select("doc_id", "n_terms", "score_ppm", "rank")
    )
