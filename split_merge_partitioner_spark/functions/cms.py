"""Deterministic Count-Min Sketch frequency registers + heavy hitters.

The mergeable frequency twin of functions/hll.py's cardinality sketch
(Cormode & Muthukrishnan 2005): a d x w counter matrix per group key,
updated with d splitmix64-derived row hashes per value.  As with HLL, the
REGISTERS are the contract surface — exact BIGINT (key, row, slot, count)
cells that are a pure function of the input multiset (invariant under
partitioning, retries, merge order, and engine), so the DuckDB oracle
replays them hash-for-hash; estimates are integer projections (min over
rows), never floats.

Why a sketch when groupBy(key, value) is exact: the sketch relation is
d·w rows PER KEY regardless of value cardinality — at 10^12 events the
exchange carries (key, row, slot) partial counts (map-side combined, at
most d·w rows per key reach the reducer) instead of one row per distinct
(key, value).  Sketches from disjoint shards/days ADD cellwise, so the
register relation is also the resumable/incremental aggregation state
checkpoint.py-style pipelines persist.

Row hashes: h_i(v) = splitmix64(v + i * 1_000_000_007) — the per-row
offsets stay below 2^32 and ids are small non-negatives, so the Spark
(signed wrapping) and DuckDB (HUGEINT) evaluations agree bit-for-bit,
and the slot index is the low log2(w) bits (w is required to be a power
of two so signed & (w-1) == unsigned % w).

CMS guarantee (one-sided): estimate >= true count always; over-estimate
> true + 2N/w with probability <= 2^-d per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph.walks import _sm64

_ROW_SEED = 1_000_000_007  # per-row hash offset; d * _ROW_SEED << 2^63


def _require_pow2(w: int) -> None:
    if w < 2 or (w & (w - 1)) != 0:
        raise ValueError(f"w must be a power of two >= 2, got {w}")


def cms_registers(
    df: DataFrame, key_col: str, value_col: str, d: int = 4, w: int = 256
) -> DataFrame:
    """(key, row, slot, c): the exact CMS counter matrix — one output row
    per NON-ZERO cell (sparse; absent cells are 0).  ``value_col`` must be
    integer-typed (hash strings upstream, the hll.py contract)."""
    _require_pow2(w)
    spark = df.sparkSession
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        v = F.col(value_col).cast("long")
        legs = [
            df.select(
                F.col(key_col).alias("key"),
                F.lit(i).cast("int").alias("row"),
                (_sm64(v + F.lit(i * _ROW_SEED)).bitwiseAND(F.lit(w - 1)))
                .cast("long")
                .alias("slot"),
            )
            for i in range(d)
        ]
        allrows = legs[0]
        for leg in legs[1:]:
            allrows = allrows.unionAll(leg)
        return allrows.groupBy("key", "row", "slot").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)


def cms_estimate(
    df: DataFrame,
    candidates: DataFrame,
    key_col: str,
    value_col: str,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """(key, value, est): CMS point estimates (min over the d rows) for the
    (key, value) pairs in ``candidates``; est >= true count always.  The
    register relation is built from ``df`` and joined d times smaller than
    any exact (key, value) aggregate would be."""
    _require_pow2(w)
    regs = cms_registers(df, key_col, value_col, d=d, w=w)
    spark = df.sparkSession
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        v = F.col(value_col).cast("long")
        probes = None
        for i in range(d):
            leg = candidates.select(
                F.col(key_col).alias("key"),
                v.alias("value"),
                F.lit(i).cast("int").alias("row"),
                (_sm64(v + F.lit(i * _ROW_SEED)).bitwiseAND(F.lit(w - 1)))
                .cast("long")
                .alias("slot"),
            )
            probes = leg if probes is None else probes.unionAll(leg)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
    return (
        probes.join(regs, ["key", "row", "slot"], "left")
        .groupBy("key", "value")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: int,
    d: int = 4,
    w: int = 256,
) -> DataFrame:
    """(key, value, est): candidate heavy hitters — every (key, value) whose
    CMS estimate reaches ``threshold``.  One-sided: contains EVERY true
    heavy hitter (no false negatives); over-counted collisions can appear
    and are bounded by the CMS guarantee.  Candidates are the distinct
    (key, value) pairs of ``df`` itself (the batch formulation; a streaming
    deployment would carry a top-k heap beside the registers instead)."""
    cands = df.select(key_col, value_col).distinct()
    return cms_estimate(df, cands, key_col, value_col, d=d, w=w).where(
        F.col("est") >= threshold
    )
