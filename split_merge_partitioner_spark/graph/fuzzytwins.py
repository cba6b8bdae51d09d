"""Fuzzy structural twins — vertices with Jaccard-SIMILAR neighborhoods,
the relaxation of graph/twins.py's exact set equality and the
structure-level analog of document near-dup: mirror/bot-farm accounts
rarely copy a wiring list exactly, they copy MOST of it.

Recipe (the dedup.py MinHash-LSH shape applied to adjacency sets, then
made exact): per vertex, a 16-coordinate MinHash signature of its neighbor
set — coordinate i = MIN over neighbors u of splitmix64(u + i·GOLD), a
map-side-combinable aggregate, zero UDFs; signatures band into 8 bands of
2 rows (band hash = chained splitmix64), candidate pairs share >= 1 band
bucket (>= 90% recall at true Jaccard 0.5, ~99.6% at 0.7 — the banding
curve 1 − (1 − j²)^8); every candidate is then EXACTLY verified:

    n_common = |N(a) ∩ N(b)|,  jaccard_ppm = ⌊1e6·n_common / |N(a) ∪ N(b)|⌋

so the output contract is exact integers — the LSH gates RECALL only, a
hash collision can only add candidates the verify stage then measures
truthfully.  No float anywhere; the DuckDB oracle replays signatures,
banding, and the verify join bit-for-bit.

Scale: signatures are one map-side-combined groupBy over the doubled edge
relation (hubs combine like everyone else — the 16 MINs ride the same
exchange); bucket join volume is n·bands rows, never the n² pair space;
the verify join runs only over candidate pairs' adjacency rows
(semi-pruned).  The same shape as functions/dedup.py's document LSH,
which this module deliberately mirrors.

ANSI: splitmix64 wraps — the wl.py flip-materialize-restore contract.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from .walks import _sm64

_GOLD = 0x9E3779B97F4A7C15
_H = 16  # minhash coordinates
_B = 8  # bands of _H // _B = 2 rows


def _salt(i: int) -> int:
    return int(np.int64(np.uint64((i + 1) * _GOLD & ((1 << 64) - 1))))


def fuzzy_twins(
    edges: DataFrame, min_jaccard_ppm: int = 300_000
) -> DataFrame:
    """(a, b, n_common, deg_a, deg_b, jaccard_ppm) for vertex pairs a < b
    whose neighbor sets are LSH-candidates AND exactly verify at
    jaccard_ppm >= ``min_jaccard_ppm`` (exact integer floor)."""
    if not 0 <= min_jaccard_ppm <= 1_000_000:
        raise ValueError("min_jaccard_ppm must be in [0, 1e6]")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    und = cand = None
    try:
        und = (
            edges.select(F.col("src").alias("v"), F.col("dst").alias("u"))
            .unionAll(edges.select(F.col("dst").alias("v"), F.col("src").alias("u")))
            .where(F.col("v") != F.col("u"))
            .distinct()
            .repartition(shuffle_n, "v")
            .localCheckpoint(eager=True)
        )
        # coordinates are 63-bit-masked (non-negative) so the MIN order is
        # identical for Spark's signed BIGINT and the oracle's UBIGINT
        mask = F.lit((1 << 63) - 1)
        sig = und.groupBy("v").agg(
            *[
                F.min(
                    _sm64(F.col("u") + F.lit(_salt(i))).bitwiseAND(mask)
                ).alias(f"m{i}")
                for i in range(_H)
            ]
        )
        r = _H // _B
        band_rows = None
        for b in range(_B):
            # chained splitmix64 over the band's coordinates
            h = _sm64(F.col(f"m{b * r}"))
            for j in range(1, r):
                h = _sm64(F.col(f"m{b * r + j}") + h)
            row = sig.select(
                "v", F.lit(b).alias("band"), h.alias("bh")
            )
            band_rows = row if band_rows is None else band_rows.unionAll(row)
        lhs = band_rows.select("band", "bh", F.col("v").alias("a"))
        rhs = band_rows.select("band", "bh", F.col("v").alias("b"))
        cand = (
            lhs.join(rhs, ["band", "bh"])
            .where(F.col("a") < F.col("b"))
            .select("a", "b")
            .distinct()
            .localCheckpoint(eager=True)  # materialize inside the ANSI window
        )
        deg = und.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
        ua = und.select(F.col("v").alias("a"), "u")
        ub = und.select(F.col("v").alias("b"), "u")
        common = (
            cand.join(ua, "a")
            .join(ub, ["b", "u"])
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
        )
        out = (
            common.join(deg.select(F.col("v").alias("a"), F.col("deg").alias("deg_a")), "a")
            .join(deg.select(F.col("v").alias("b"), F.col("deg").alias("deg_b")), "b")
            .select(
                "a",
                "b",
                "n_common",
                F.col("deg_a").cast("long").alias("deg_a"),
                F.col("deg_b").cast("long").alias("deg_b"),
                F.expr(
                    "CAST(1000000 * n_common AS BIGINT)"
                    " div (deg_a + deg_b - n_common)"
                ).alias("jaccard_ppm"),
            )
            .where(F.col("jaccard_ppm") >= F.lit(min_jaccard_ppm))
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        for df in (und, cand):
            if df is not None:
                release(df)
