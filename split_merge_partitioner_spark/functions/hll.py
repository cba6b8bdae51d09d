"""Deterministic HyperLogLog distinct-count GROUP BY — the cardinality
aggregate an analytics deployment runs per dimension (distinct users per
event type / per day / per repo) when exact COUNT(DISTINCT) would shuffle
every value.

Registers, not estimates, are the contract surface: the splitmix64-seeded
(key, register_index, max_rank) rows are EXACT integers (the
graph/hyperanf.py discipline — m = 64 registers, B = 6 index bits, rank =
trailing zeros + 1 of the remaining 58 bits), so the DuckDB oracle
replays them hash-for-hash; the float HLL estimate is a trailing
projection (``approx_distinct``) clients apply after the exact part.
Versus Spark's approx_count_distinct: same sketch family, but THIS one is
a pure function of the input values — identical across partitionings,
retries, engines, and runs, so it composes with the checkpoint/resume
and oracle machinery.

Plan shape: hash/index/rank are four wrapping-BIGINT expressions inside
the scan's codegen stage (spark.sql.ansi.enabled toggled off and restored
— the walks.py pattern); ONE partial-aggregated exchange keyed by
(key, j) carrying max-rank bytes (≤ 64 rows per key reach the reduce
side), one groupBy(key) for the estimate.  At 10^12 rows the exchange is
64·|keys| rows — COUNT(DISTINCT)'s value-keyed exchange is the thing this
exists to avoid.

Values must be integer-typed (ids); hash strings to ids upstream (e.g.
xxhash64) if needed — kept out of this operator so the oracle replay
stays engine-portable.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph.walks import _MASK63, _sm64

_B = 6
_M = 64
_ALPHA = 0.7213 / (1.0 + 1.079 / _M)
_MAX_RANK = 64 - _B + 1  # w == 0 -> all 58 remaining bits zero


def hll_registers(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """(key, j, r): per-key HLL register vector as exact integer rows —
    j = low 6 bits of splitmix64(value), r = max over values of
    (trailing zeros of the high 58 bits + 1).  Absent registers are
    implicitly rank 0 (sparse representation)."""
    spark = df.sparkSession
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        h = _sm64(F.col(value_col).cast("long"))
        base = df.select(F.col(key_col).alias("key"), h.alias("__h__"))
        w = F.shiftrightunsigned(F.col("__h__"), _B)
        low = w.bitwiseAND(-w)  # lowest set bit; 0 when w == 0
        rank = (
            F.when(w == 0, F.lit(_MAX_RANK))
            .otherwise((F.log2(low) + F.lit(1)).cast("long"))
        )
        out = (
            base.select(
                "key",
                (F.col("__h__").bitwiseAND(F.lit(_M - 1))).alias("j"),
                rank.alias("r"),
            )
            .groupBy("key", "j")
            .agg(F.max("r").alias("r"))
        )
        # force analysis inside the ansi-off window (execution is lazy but
        # expression RESOLUTION happens now; the wrapping arithmetic is
        # already baked into the resolved plan)
        out.schema
        return out
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)


def approx_distinct(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """(key, approx_distinct): the standard HLL estimate (harmonic mean +
    linear-counting small-range correction) over hll_registers — float by
    nature, for clients; oracle-grade checks compare the registers."""
    regs = hll_registers(df, key_col, value_col)
    per_key = regs.groupBy("key").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("r"))).alias("__s_present__"),
        F.count(F.lit(1)).alias("__nz__"),
    )
    s = F.col("__s_present__") + (F.lit(_M) - F.col("__nz__"))  # absent regs = 2^0
    e_raw = F.lit(_ALPHA * _M * _M) / s
    v = F.lit(_M) - F.col("__nz__")
    e_small = F.lit(float(_M)) * F.log(F.lit(float(_M)) / F.greatest(v, F.lit(1)))
    return per_key.select(
        "key",
        F.when((e_raw <= 2.5 * _M) & (v > 0), e_small)
        .otherwise(e_raw)
        .alias("approx_distinct"),
    )
