"""Distributed R-MAT / Graph500-style graph generation — pure column
expressions over ``spark.range(m)``, zero shuffles, zero driver state.

Why it exists: the repo's BA fixture generator (synthetic.py) is a
driver-side NumPy loop — right for unit fixtures, wrong for "generate the
100 TB test graph ON the cluster".  R-MAT (Chakrabarti, Zhan & Faloutsos,
SDM 2004; the Graph500 reference generator) is embarrassingly parallel:
every edge is an independent function of its index, so a 1e12-edge graph
generates as one narrow map over ``range(m)`` with no shuffle, no skew, and
perfect restart/retry determinism.

Determinism discipline (the walks.py/hyperanf.py recipe): the quadrant
decision for (edge e, recursion level L) is
``splitmix64(splitmix64(e + seed) + (L+1) * GOLD) % 1_000_000`` compared
against INTEGER ppm thresholds — no floats anywhere, so the DuckDB oracle
replays the whole edge list bit-for-bit and a re-run (or a recomputed lost
partition) regenerates identical edges.  Quadrant map per level, with
``r`` the ppm draw and (a, b, c) the classic top-left/top-right/bottom-left
mass: src_bit = [r >= a+b], dst_bit = [a <= r < a+b] OR [r >= a+b+c];
``src = Σ src_bit_L << L`` (level 0 = least-significant bit).

Graph500 semantics: the raw output is a DIRECTED MULTIGRAPH with possible
self-loops (dedup/canonicalization is the consumer's choice — the
partitioner pipeline's edges_from_* already does it); defaults a/b/c =
0.57/0.19/0.19 are the Graph500 constants.

ANSI note: splitmix64 needs Java uint64 wraparound.  By default the
function flips ``spark.sql.ansi.enabled`` off, MATERIALIZES the edges via
localCheckpoint, and restores the conf (the wl.py contract — a lazy plan
would overflow-throw after restore).  At generate-a-petabyte scale pass
``lazy=True`` with ANSI already disabled session-wide and write the result
straight to parquet instead of checkpointing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..graph.walks import _sm64

_MASK63 = (1 << 63) - 1
_GOLD = 0x9E3779B97F4A7C15  # odd mixing constant for the per-level offset
_PPM = 1_000_000


def rmat_edges(
    spark: SparkSession,
    scale: int,
    edge_factor: int = 16,
    a_ppm: int = 570_000,
    b_ppm: int = 190_000,
    c_ppm: int = 190_000,
    seed: int = 42,
    num_partitions: int | None = None,
    lazy: bool = False,
) -> DataFrame:
    """(edge_id, src, dst): ``edge_factor * 2**scale`` R-MAT edges over
    ``2**scale`` vertices.  Pure function of (scale, edge_factor, ppm
    thresholds, seed) — bit-stable under repartition, retry, and re-run."""
    if not 1 <= scale <= 62:
        raise ValueError("scale must be in [1, 62]")
    if edge_factor < 1:
        raise ValueError("edge_factor must be >= 1")
    if min(a_ppm, b_ppm, c_ppm) < 0 or a_ppm + b_ppm + c_ppm > _PPM:
        raise ValueError("ppm thresholds must be non-negative and sum <= 1e6")
    m = edge_factor * (1 << scale)
    if lazy and spark.conf.get("spark.sql.ansi.enabled") == "true":
        raise ValueError(
            "lazy=True returns a wrapping-arithmetic plan: disable "
            "spark.sql.ansi.enabled session-wide first"
        )
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        base = spark.range(0, m, 1, num_partitions or spark.sparkContext.defaultParallelism)
        he = _sm64(F.col("id") + F.lit(seed))
        import numpy as np

        src_expr = F.lit(0).cast("long")
        dst_expr = F.lit(0).cast("long")
        for level in range(scale):
            off = int(np.int64(np.uint64((level + 1) * _GOLD & ((1 << 64) - 1))))
            r = _sm64(he + F.lit(off)).bitwiseAND(F.lit(_MASK63)) % _PPM
            src_bit = (r >= F.lit(a_ppm + b_ppm)).cast("long")
            dst_bit = (
                ((r >= F.lit(a_ppm)) & (r < F.lit(a_ppm + b_ppm)))
                | (r >= F.lit(a_ppm + b_ppm + c_ppm))
            ).cast("long")
            src_expr = src_expr + F.shiftleft(src_bit, level)
            dst_expr = dst_expr + F.shiftleft(dst_bit, level)
        out = base.select(
            F.col("id").alias("edge_id"),
            src_expr.alias("src"),
            dst_expr.alias("dst"),
        )
        if lazy:
            return out
        return out.localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
