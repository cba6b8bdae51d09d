"""Exact grouped numeric profiling: n / min / max / discrete percentiles.

Built for cross-engine determinism: Spark's ``percentile`` and DuckDB's
``quantile_cont`` both interpolate (and differ in edge handling), so this
module computes DISCRETE percentiles from first principles — the value at
1-based rank ceil(p * n) in sorted order — with an explicit row_number
window.  Duplicate values make any tie order land on the same value, so
the result is a pure function of the multiset.  Inputs are quantized to
exact int64 (round(x * 1e6)) so min/max/percentiles carry no float noise.

Scale shape: ONE exchange hash-partitioned by the group key — the sort
window and the final aggregate share it (grouping key == window partition
key).  Per-group data must fit a task for the sort, which holds whenever
the group count is modest (event types, languages, sources); for
billion-row single groups use approx sketches instead — this operator is
the exact-profile tool, and says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def numeric_profile(
    df: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    percentiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """One row per group: (group, n, min_q, max_q, p<NN>_q ...) over the
    int64-quantized value column (round(value * 1e6)); p<NN>_q = the exact
    discrete percentile (value at rank ceil(p * n))."""
    for p in percentiles:
        if not 0.0 < p <= 1.0:
            raise ValueError(f"percentile {p} outside (0, 1]")
    q = df.select(
        F.col(group_col).alias("grp"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("vq"),
    )
    w = Window.partitionBy("grp").orderBy("vq")
    ranked = q.select(
        "grp",
        "vq",
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("grp")).alias("n_grp"),
    )
    aggs = [
        F.count(F.lit(1)).alias("n"),
        F.min("vq").alias("min_q"),
        F.max("vq").alias("max_q"),
    ]
    for p in percentiles:
        name = f"p{int(round(p * 100)):02d}_q"
        # rank = ceil(p * n) computed in IEEE double on BOTH engines (the
        # oracle writes the identical expression), so boundary rounding is
        # cross-engine deterministic by construction
        aggs.append(
            F.max(
                F.when(
                    F.col("rk") == F.ceil(F.lit(p) * F.col("n_grp")).cast("long"),
                    F.col("vq"),
                )
            ).alias(name)
        )
    return ranked.groupBy(F.col("grp").alias(group_col)).agg(*aggs)


def source_profile(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(source, n_docs, n_unique_texts, sum_chars, mean_chars, langs) —
    the per-source corpus dashboard a C4/RefinedWeb-style pipeline tracks
    per domain: volume, exact-duplicate pressure (distinct md5 of the
    text), and language spread.  All integers (mean_chars = sum DIV n);
    langs = count of distinct lang values.  One source-keyed exchange
    with partial aggregation; the md5 distinct-count is
    approx-free/exact because it aggregates WITHIN the source group."""
    return (
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct(F.md5(F.col(text_col))).alias("n_unique_texts"),
            F.sum(F.length(text_col)).alias("sum_chars"),
            F.countDistinct("lang").alias("langs"),
        )
        .select(
            "source",
            "n_docs",
            F.col("n_unique_texts").cast("long").alias("n_unique_texts"),
            F.col("sum_chars").cast("long").alias("sum_chars"),
            F.expr("sum_chars div n_docs").alias("mean_chars"),
            F.col("langs").cast("long").alias("langs"),
        )
    )


def source_overlap(
    docs: DataFrame,
    n: int = 5,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Pairwise n-gram overlap matrix between corpus sources — the
    data-governance twin of ngram_contamination: instead of asking "is this
    document contaminated by that benchmark", it asks "how much do my
    SOURCES overlap each other" (shared scrapes, mirrored sites, common
    boilerplate), which is what decides dedup ordering and source weighting
    at corpus-assembly time.

    For every unordered source pair (a < b): the number of distinct word
    ``n``-grams in both, each side's distinct total, and the Jaccard in
    exact ppm (floor((inter * 1e6) div (|A| + |B| - inter))).  Pairs with
    zero shared grams are omitted (the result is overlap-sparse).

    Scale shape: one distinct over (source, gram) rows (gram-keyed
    exchange, map-side combined), then a gram-keyed self-join whose
    per-gram fan-out is bounded by the number of SOURCES carrying the gram
    — with S sources the worst gram emits C(S,2) pairs, so the join output
    is at most C(S,2) * |distinct grams|, never document-quadratic; per-
    source totals are a broadcast.  At 100 TB with S ~ 10^3 domains-of-
    interest this stays a linear pass over the gram table.  (For S ~ 10^6
    raw domains you'd bucket sources first — documented seam.)
    """
    from .text import _token_array, _word_ngrams

    sg = (
        docs.select(
            F.col(source_col).alias("source"), _token_array(text_col).alias("__toks__")
        )
        .select("source", F.explode(_word_ngrams("__toks__", n)).alias("gram"))
        .distinct()
    )
    totals = sg.groupBy("source").agg(F.count(F.lit(1)).alias("n_grams"))
    a = sg.select(F.col("source").alias("src_a"), "gram")
    b = sg.select(F.col("source").alias("src_b"), "gram")
    inter = (
        a.join(b, "gram")
        .where(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    ta = totals.select(F.col("source").alias("src_a"), F.col("n_grams").alias("n_a"))
    tb = totals.select(F.col("source").alias("src_b"), F.col("n_grams").alias("n_b"))
    return (
        inter.join(F.broadcast(ta), "src_a")
        .join(F.broadcast(tb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_shared",
            "n_a",
            "n_b",
            F.expr("(n_shared * 1000000L) div (n_a + n_b - n_shared)").alias(
                "jaccard_ppm"
            ),
        )
    )


def exact_percentiles(
    df: DataFrame,
    value_col: str = "value",
    percentiles_ppm: tuple[int, ...] = (500_000, 900_000, 990_000),
) -> DataFrame:
    """EXACT percentiles of a numeric column, no sketch: one row per
    requested percentile — (p_ppm, value_micros, cum_count, n_rows), where
    value_micros is the smallest round(value·1e6) whose cumulative count
    reaches ceil(p·n) (the standard lower-quantile definition), all
    arithmetic BIGINT.

    Why not approx_percentile: its sketch is engine- and merge-order-
    dependent, so results aren't reproducible across engines or even
    retries.  This operator is exact and bit-stable — the right tool for
    SLO thresholds and cross-engine verification.

    Scale contract: cost is governed by |DISTINCT rounded values|, not
    rows — groupBy(value_micros) with map-side combine collapses the scan
    to one row per distinct value, and only THAT relation (money/metric
    columns: thousands of values) passes through the ordered cumulative
    window.  For genuinely continuous data, quantize to the precision you
    report at (the micros rounding here IS that quantization) — the
    documented seam; a KLL sketch is the alternative when distincts are
    unbounded, at the price of exactness.
    """
    if not percentiles_ppm:
        raise ValueError("percentiles_ppm must be non-empty")
    if any(p < 1 or p > 1_000_000 for p in percentiles_ppm):
        raise ValueError("percentiles must be ppm values in [1, 1000000]")
    from pyspark.sql import Window

    vm = F.round(F.col(value_col) * 1e6).cast("long").alias("value_micros")
    by_val = df.select(vm).groupBy("value_micros").agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.orderBy("value_micros").rowsBetween(Window.unboundedPreceding, 0)
    cum = by_val.select(
        "value_micros", F.sum("c").over(w).alias("cum_count")
    )
    spark = df.sparkSession
    ps = spark.createDataFrame([(int(p),) for p in percentiles_ppm], "p_ppm long")
    n = by_val.agg(F.sum("c").alias("n_rows"))
    hits = (
        cum.crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ps))
        .where(
            F.col("cum_count")
            >= F.expr("(p_ppm * n_rows + 999999) div 1000000")
        )
        .groupBy("p_ppm")
        .agg(
            F.min("value_micros").alias("value_micros"),
            F.max("n_rows").alias("n_rows"),
        )
    )
    # re-attach the chosen value's cumulative count (informational)
    return (
        hits.join(cum, "value_micros")
        .select("p_ppm", "value_micros", "cum_count", "n_rows")
    )


def skew_report(
    df: DataFrame, key_col: str, top_k: int = 10
) -> DataFrame:
    """(rank, key, n_rows, share_ppm, cum_share_ppm, n_keys_total,
    rows_total): the top-``top_k`` heaviest keys of a relation with exact
    floor-ppm shares — the pre-shuffle skew diagnosis every groupBy/join
    key deserves before it becomes a straggler at 1000 executors (a key
    holding >1/executors of the rows caps your speedup; salting/AQE-skew
    thresholds come straight from this report).

    One map-side-combined exchange for the per-key counts; the global
    ordering window only materializes the top_k rows (WindowGroupLimit
    pushes the limit below the sort, the neighbor_sample audit), and the
    scalar totals ride a broadcast cross-join — nothing driver-side.
    """
    from pyspark.sql import Window

    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    totals = counts.agg(
        F.sum("n_rows").alias("rows_total"),
        F.count(F.lit(1)).cast("long").alias("n_keys_total"),
    )
    w = Window.orderBy(F.desc("n_rows"), F.asc("key"))
    wc = Window.orderBy(F.desc("n_rows"), F.asc("key")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = (
        counts.withColumn("rank", F.row_number().over(w))
        .withColumn("cum_rows", F.sum("n_rows").over(wc))
        .where(F.col("rank") <= top_k)
    )
    return ranked.crossJoin(F.broadcast(totals)).select(
        F.col("rank").cast("long").alias("rank"),
        "key",
        "n_rows",
        F.expr("CAST(1000000 * n_rows div rows_total AS BIGINT)").alias("share_ppm"),
        F.expr("CAST(1000000 * cum_rows div rows_total AS BIGINT)").alias(
            "cum_share_ppm"
        ),
        F.col("n_keys_total"),
        F.col("rows_total").cast("long").alias("rows_total"),
    )
