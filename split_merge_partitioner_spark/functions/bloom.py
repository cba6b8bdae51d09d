"""Deterministic Bloom-filter registers + membership pre-filter.

The membership twin of functions/cms.py (frequency) and functions/hll.py
(cardinality): a fixed m-bit array updated with k splitmix64-derived bit
positions per key.  As with those sketches the REGISTERS are the contract
surface — exact BIGINT (word, bits) rows that are a pure function of the
input key SET (invariant under partitioning, duplicates, retries, merge
order, and engine), so the DuckDB oracle replays them bit-for-bit.

Why this exists at 100 TB: the canonical shuffle-avoidance device.  A join
whose probe side is petabytes and whose build side is merely large (too big
to broadcast raw, small enough to sketch) spends its life exchanging probe
rows that match nothing.  ``bloom_membership``'s ``maybe`` column is a pure
projection against a <=m/62-row broadcast relation — filtering on it before
the real join drops the guaranteed-miss rows BEFORE the exchange, at a
false-positive (never false-negative) rate of ~(1-e^{-kn/m})^k.  Registers
from disjoint shards/days OR together cellwise, so the relation is also the
incremental build state a resumable pipeline checkpoints.

Spark's own ``spark.sql.optimizer.runtimeFilter.bloomFilter.enabled`` does
this adaptively inside one query; this operator makes the filter a
first-class, persistable, cross-job artifact (build once, probe from many
jobs/days) with exact cross-engine semantics.

Hashing: bit_i(v) = splitmix64(v + i * 1_000_000_007) & (m_bits - 1)
(m_bits a power of two so the signed & equals the unsigned mod; same
discipline as cms.py).  Words pack 62 bits, not 64 — bit 62/63 of a BIGINT
would go negative in Spark and differ from DuckDB's HUGEINT shift, so the
packed words stay positive int64 in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from split_merge_partitioner_spark.graph.walks import _sm64

_BIT_SEED = 1_000_000_007  # per-hash offset, matches cms.py's row seed
WORD_BITS = 62  # positive-int64-safe packing in BOTH engines


def _require_pow2(m: int) -> None:
    if m < 2 or (m & (m - 1)) != 0:
        raise ValueError(f"m_bits must be a power of two >= 2, got {m}")


def bloom_registers(
    df: DataFrame, key_col: str, m_bits: int = 1024, k: int = 4
) -> DataFrame:
    """(word, bits): the packed m-bit array over the DISTINCT keys of
    ``key_col`` — one row per non-zero 62-bit word (absent words are 0).
    One map-side-combined groupBy("word") exchange of <= ceil(m/62) rows."""
    _require_pow2(m_bits)
    spark = df.sparkSession
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        v = F.col(key_col).cast("long")
        legs = []
        for i in range(k):
            idx = (
                _sm64(v + F.lit(i * _BIT_SEED))
                .bitwiseAND(F.lit(m_bits - 1))
                .cast("long")
            )
            legs.append(
                df.select(idx.alias("idx")).select(
                    F.expr(f"CAST(idx div {WORD_BITS} AS BIGINT)").alias("word"),
                    # shiftleft by a COLUMN needs the SQL form (the Python
                    # helper only takes a literal count)
                    F.expr(
                        f"shiftleft(CAST(1 AS BIGINT), CAST(idx % {WORD_BITS} AS INT))"
                    ).alias("b"),
                )
            )
        allbits = legs[0]
        for leg in legs[1:]:
            allbits = allbits.unionAll(leg)
        return allbits.groupBy("word").agg(F.bit_or("b").cast("long").alias("bits"))
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)


def bloom_membership(
    probes: DataFrame,
    registers: DataFrame,
    key_col: str,
    m_bits: int = 1024,
    k: int = 4,
) -> DataFrame:
    """(key, maybe): probe every DISTINCT key of ``probes[key_col]`` against
    a ``bloom_registers`` relation.  maybe=false is definitive (no false
    negatives); maybe=true is membership up to the Bloom false-positive rate.

    Plan shape: k projection legs -> one broadcast join against the
    <=ceil(m/62)-row register relation -> one groupBy(key).  The probe side
    is never exchanged on anything but its own key; at 10^12 probe rows the
    register join is a map-side lookup."""
    _require_pow2(m_bits)
    spark = probes.sparkSession
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        v = F.col(key_col).cast("long")
        legs = []
        for i in range(k):
            idx = (
                _sm64(v + F.lit(i * _BIT_SEED))
                .bitwiseAND(F.lit(m_bits - 1))
                .cast("long")
            )
            legs.append(
                probes.select(F.col(key_col).cast("long").alias("key"), idx.alias("idx")).select(
                    "key",
                    F.expr(f"CAST(idx div {WORD_BITS} AS BIGINT)").alias("word"),
                    F.expr(f"CAST(idx % {WORD_BITS} AS INT)").alias("bit"),
                )
            )
        allprobes = legs[0]
        for leg in legs[1:]:
            allprobes = allprobes.unionAll(leg)
        hit = F.expr(
            "CAST(shiftrightunsigned(coalesce(bits, CAST(0 AS BIGINT)), bit) & 1 AS BIGINT)"
        )
        return (
            allprobes.join(F.broadcast(registers), "word", "left")
            .select("key", hit.alias("hit"))
            .groupBy("key")
            .agg((F.sum("hit") == F.lit(k)).alias("maybe"))
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
