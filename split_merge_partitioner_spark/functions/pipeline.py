"""End-to-end training-corpus cleaning: the composition a 100-TB data
pipeline actually runs — exact dedup -> language filter -> quality floor ->
token-length window — fused into ONE pass over the documents table.

Plan shape (the point of this module): every per-doc column (language vote,
quality score, token count, content hash) is computed in a single projection
over one scan — no cross-projection self-joins — and keeper election is a
window over the content hash, so the whole pipeline costs exactly ONE
shuffle (the hash partitioning the dedup semantics require).  All
expressions are the SAME JVM-side builders the standalone
operators use (functions/text.py), so the composite inherits their
SQL-portability and earns a full DuckDB oracle (__spark_entry__
"corpus_clean")."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import lang_pred_col, n_tokens_col, quality_score_col


def clean_corpus(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en", "de", "fr", "es"),
    min_quality: float = 0.3,
    min_tokens: int = 10,
    max_tokens: int = 1_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Kept documents with provenance: (doc_id, lang_pred, n_tokens,
    quality_score, n_copies), where n_copies is the exact-duplicate group
    size this keeper represents.  A document survives iff it is its
    duplicate-group's keeper (min id), its predicted language is in
    ``langs``, quality_score >= min_quality, and its whitespace token count
    lies in [min_tokens, max_tokens].  One scan, one shuffle."""
    from pyspark.sql import Window

    enriched = docs.select(
        F.col(id_col).alias("doc_id"),
        F.md5(F.col(text_col)).alias("text_md5"),
        lang_pred_col(text_col).alias("lang_pred"),
        n_tokens_col(text_col).alias("n_tokens"),
        # rounded BEFORE the threshold filter so the cross-engine oracle
        # compares on identical values (no FP boundary ambiguity)
        F.round(quality_score_col(text_col), 6).alias("quality_score"),
    )
    # keeper election as a window over the content hash: min(doc_id) and the
    # group size arrive in the SAME single shuffle the dedup needs — one scan
    # of the source, no groupBy+self-join second pass
    w = Window.partitionBy("text_md5")
    return (
        enriched.withColumn("keeper_id", F.min("doc_id").over(w))
        .withColumn("n_copies", F.count(F.lit(1)).over(w))
        .where(
            (F.col("doc_id") == F.col("keeper_id"))
            & F.col("lang_pred").isin(*langs)
            & (F.col("quality_score") >= F.lit(min_quality))
            & F.col("n_tokens").between(min_tokens, max_tokens)
        )
        .select("doc_id", "lang_pred", "n_tokens", "quality_score", "n_copies")
    )


def quality_filter(
    docs,
    min_tokens: int = 30,
    max_tokens: int = 100_000,
    min_ttr: float = 0.35,
    max_dup_frac: float = 0.3,
    max_top2_frac: float = 0.1,
    min_quality: float = 0.5,
    text_col: str = "text",
):
    """(doc_id, keep, reasons): the keep/drop DECISION over the quality
    signals — Gopher's §A1 rule table made executable (length window,
    type-token ratio floor, duplicate-2-gram ceiling, top-2-gram coverage
    ceiling, punctuation/digit quality floor).

    ``reasons`` is the comma-joined list of failed rules in a FIXED order
    (too_short, too_long, low_ttr, dup_ngrams, top_ngram, low_quality) —
    deterministic, so the DuckDB replay hash-matches; empty string means
    keep.  Pipelines filter on ``keep`` and audit the drop histogram on
    ``reasons`` (the standard data-quality dashboard cut).

    Plan: repetition_stats' scalar leg is zero-shuffle; its top-2-gram leg
    is the one (doc, gram) exchange; the quality-score expressions ride
    the same scan.  The decision itself is pure column logic.
    """
    from pyspark.sql import functions as F

    from .text import quality_score_col, repetition_stats

    rep = repetition_stats(docs, text_col=text_col, dup_n=2)
    q = docs.select(
        "doc_id", F.round(quality_score_col(text_col), 6).alias("quality_score")
    )
    j = rep.join(q, "doc_id")
    rules = [
        ("too_short", F.col("n_tokens") < min_tokens),
        ("too_long", F.col("n_tokens") > max_tokens),
        ("low_ttr", F.col("ttr") < min_ttr),
        ("dup_ngrams", F.col("dup_frac") > max_dup_frac),
        ("top_ngram", F.col("top2_char_frac") > max_top2_frac),
        ("low_quality", F.col("quality_score") < min_quality),
    ]
    reasons = F.concat_ws(
        ",", *[F.when(cond, F.lit(name)) for name, cond in rules]
    )
    return j.select(
        "doc_id",
        (reasons == "").alias("keep"),
        reasons.alias("reasons"),
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 64,
    stride: int = 48,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split each document into overlapping fixed-token windows — the
    context-window prep step of a training pipeline (window = model context
    in tokens, stride < window = overlap so no boundary context is lost).

    One row per (doc, chunk): (doc_id, chunk_id, n_tokens, chunk_text).
    chunk i covers tokens [i*stride, i*stride + window); a document of n
    tokens yields 1 chunk when n <= window, else ceil((n-window)/stride)+1
    (the last chunk keeps the tail and may be short).  Chunk counts are
    exact integers and the tokenizer is the shared _token_array expression,
    so the DuckDB replay is hash-exact.

    Plan: a single narrow projection — tokenize, per-row sequence(0,
    n_chunks-1), explode, slice — ZERO shuffles and no UDF; at 100 TB the
    op is embarrassingly parallel and bounded by write bandwidth.  Row
    growth is the overlap factor ~ window/stride (documented; pick stride
    = window for disjoint packing)."""
    from .text import _token_array

    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        raise ValueError("stride > window would drop tokens between chunks")
    toks = docs.select(
        F.col(id_col).alias("doc_id"), _token_array(text_col).alias("__toks__")
    ).select(
        "doc_id",
        "__toks__",
        F.size("__toks__").cast("long").alias("__n__"),
    )
    n_chunks = F.when(F.col("__n__") <= window, F.lit(1).cast("long")).otherwise(
        F.expr(f"(__n__ - {window} + {stride} - 1) div {stride}") + 1
    )
    return (
        toks.select(
            "doc_id",
            "__toks__",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias(
                "chunk_id"
            ),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.slice(
                "__toks__", (F.col("chunk_id") * stride + 1).cast("int"), window
            ).alias("__w__"),
        )
        .select(
            "doc_id",
            "chunk_id",
            F.size("__w__").cast("long").alias("n_tokens"),
            F.array_join("__w__", " ").alias("chunk_text"),
        )
    )


def pack_sequences(
    docs: DataFrame,
    context_len: int = 512,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """GPT-style sequence packing: concatenate documents in a deterministic
    order and cut the token stream at fixed ``context_len`` boundaries —
    the standard pre-training batch construction (documents straddle
    boundaries; nothing is padded or dropped).  Returns the (bin, doc)
    token-range map:

      (group, bin, doc_id, doc_from, doc_to, bin_from)

    meaning tokens [doc_from, doc_to) of doc_id land in ``bin`` at offset
    bin_from; a doc spanning k boundaries yields k+1 rows.  Exact
    integers: token counts via the portable whitespace count, offsets via
    ONE window cumsum ordered by doc_id within ``group_col`` — packing is
    embarrassingly parallel across groups (sources/shards) and
    deterministic under any partitioning, which is what makes the packed
    corpus resumable and replayable.  Bin straddle rows come from a
    sequence() explode over the covered bin range (narrow, no join).

    Scale shape: one group-keyed window exchange; output rows =
    #docs + #boundary crossings <= #docs + total_tokens/context_len.
    """
    if context_len < 1:
        raise ValueError("context_len must be >= 1")
    from pyspark.sql import Window

    from .text import n_tokens_col

    w = (
        Window.partitionBy(group_col)
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    base = (
        docs.select(
            F.col(group_col).alias("group"),
            "doc_id",
            n_tokens_col(text_col).alias("n_tok"),
        )
        .where(F.col("n_tok") > 0)
        .withColumn("end_off", F.sum("n_tok").over(
            Window.partitionBy("group").orderBy("doc_id").rowsBetween(
                Window.unboundedPreceding, 0
            )
        ))
        .select(
            "group", "doc_id", "n_tok",
            (F.col("end_off") - F.col("n_tok")).alias("start_off"),
            "end_off",
        )
    )
    c = F.lit(context_len)
    spans = base.select(
        "group",
        "doc_id",
        "n_tok",
        "start_off",
        F.explode(
            F.sequence(
                F.expr(f"start_off div {context_len}"),
                F.expr(f"(end_off - 1) div {context_len}"),
            )
        ).alias("bin"),
    )
    bin_start = F.col("bin") * c
    bin_end = bin_start + c
    doc_from = F.greatest(bin_start, F.col("start_off")) - F.col("start_off")
    doc_to = F.least(bin_end, F.col("start_off") + F.col("n_tok")) - F.col("start_off")
    return spans.select(
        "group",
        F.col("bin").cast("long").alias("bin"),
        "doc_id",
        doc_from.cast("long").alias("doc_from"),
        doc_to.cast("long").alias("doc_to"),
        (F.greatest(bin_start, F.col("start_off")) - bin_start)
        .cast("long")
        .alias("bin_from"),
    )


def prepare_training_corpus(
    docs: DataFrame,
    eval_docs: DataFrame,
    context_len: int = 128,
    decontam_n: int = 5,
    min_overlap: int = 1,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """The end-to-end training-corpus preparation pipeline, composed from
    the individually-oracled stages in their production order:

      1. quality gate   — Gopher rule table (quality_filter), keep only '' reasons
      2. exact dedup    — one keeper per distinct text (min doc_id) AMONG
                          quality survivors (dedup after the gate: a junk
                          copy must not shadow a clean one)
      3. decontamination — drop survivors sharing any word decontam_n-gram
                          with the eval corpus (ngram_contamination)
      4. sequence packing — pack_sequences over the survivors per
                          ``group_col``: the final (bin, doc, token-range)
                          map a trainer consumes

    Returns the packing map restricted to surviving documents.  Every
    stage is a narrow addition to the same logical plan: the gate is
    column logic + one (doc, gram) exchange, dedup one md5-keyed exchange,
    decontamination one broadcast gram join, packing one group-keyed
    window — 4 exchanges total on top of the scan, nothing quadratic.
    """
    from pyspark.sql import functions as F

    from .decontam import ngram_contamination
    from .dedup import exact_dedup

    kept = quality_filter(docs, text_col=text_col).where(F.col("keep")).select("doc_id")
    qd = docs.join(kept, "doc_id", "leftsemi")
    keepers = exact_dedup(qd, text_col=text_col).select(
        F.col("keeper_id").alias("doc_id")
    )
    dd = qd.join(keepers, "doc_id", "leftsemi")
    contaminated = (
        ngram_contamination(dd, eval_docs, n=decontam_n, min_overlap=min_overlap,
                            text_col=text_col)
        .where(F.col("is_contaminated"))
        .select("doc_id")
    )
    surv = dd.join(contaminated, "doc_id", "left_anti")
    return pack_sequences(surv, context_len=context_len, group_col=group_col,
                          text_col=text_col)
