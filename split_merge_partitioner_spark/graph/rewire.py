"""Configuration-model rewiring — a degree-preserving null graph.

The standard significance baseline for every structural statistic this
engine computes (triangles, motifs, assortativity, clustering): compare the
observed count against the same statistic on a graph with the SAME degree
sequence but otherwise random wiring (Newman, "The structure and function
of complex networks", SIAM Review 2003 §4.2.1 — stub matching).  Classic
configuration-model semantics: the output is a MULTIGRAPH and may contain
self-loops; callers who need a simple graph filter/dedup afterwards
(documented bias, as in the literature).

Determinism discipline: there is no RNG — the stub permutation is a SORT
by splitmix64(edge, side, seed) with a full (src, dst, side) tie-break, so
the "random" matching is a pure function of (edges, seed): bit-stable under
repartition and retries, and the DuckDB oracle replays the entire rewired
edge list with ROW_NUMBER over the identical total order.

Execution: each edge contributes its two endpoints as stubs; the 2m stubs
are range-repartitioned on the hash and sorted within partitions (globally
ordered partitions), zipWithIndex assigns the global rank in parallel (the
sources/edges.py `dense_ids` idiom — never a one-partition window), and
consecutive ranks pair up via one equi-join on rank DIV 2.  Total: one
range exchange + one pair join — the same cost as sorting the edge list.
Degree preservation is by construction (every stub used exactly once).

ANSI note: splitmix64 wraps; the wl.py contract (flip off, materialize,
restore) applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .walks import _sm64

_P1 = 1_000_003
_P2 = 40_503


def configuration_rewire(edges: DataFrame, seed: int = 42) -> DataFrame:
    """(pair_id, src, dst): a configuration-model multigraph with exactly
    the degree sequence of ``edges`` (undirected; each input edge donates
    one stub per endpoint).  Pure function of (edges, seed)."""
    spark = edges.sparkSession
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        stubs = edges.select(
            F.col("src").alias("v"), "src", "dst", F.lit(0).alias("side")
        ).unionAll(
            edges.select(
                F.col("dst").alias("v"), "src", "dst", F.lit(1).alias("side")
            )
        )
        # 63-bit mask keeps h non-negative so the signed-BIGINT sort order
        # here equals the oracle's unsigned order
        keyed = stubs.select(
            "v", "src", "dst", "side",
            _sm64(
                F.col("src") * _P1 + F.col("dst") * _P2 + F.col("side") + F.lit(seed)
            ).bitwiseAND(F.lit((1 << 63) - 1)).alias("h"),
        )
        ordered = keyed.repartitionByRange(
            F.col("h"), F.col("src"), F.col("dst"), F.col("side")
        ).sortWithinPartitions("h", "src", "dst", "side")
        out_schema = StructType(
            [StructField("v", LongType()), StructField("idx", LongType())]
        )
        ranked = spark.createDataFrame(
            ordered.rdd.zipWithIndex().map(lambda t: (t[0]["v"], t[1])), out_schema
        )
        left = ranked.where(F.col("idx") % 2 == 0).select(
            (F.col("idx") / 2).cast("long").alias("pair_id"),
            F.col("v").alias("src"),
        )
        right = ranked.where(F.col("idx") % 2 == 1).select(
            ((F.col("idx") - 1) / 2).cast("long").alias("pair_id"),
            F.col("v").alias("dst"),
        )
        return (
            left.join(right, "pair_id")
            .select("pair_id", "src", "dst")
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)


def triangle_significance(edges: DataFrame, seed: int = 42) -> DataFrame:
    """One row (n_triangles_observed, n_triangles_null, excess): the
    observed triangle count vs the count on the degree-preserving
    configuration-model null graph (rewired with ``seed``, then
    canonicalized to a simple graph — the standard practice; the dedup
    perturbs the null's degree sequence negligibly and is documented in
    every empirical use of the model).  excess = observed − null is the
    community-structure signal: power-law degree alone predicts the null
    count, so a large positive excess means the clustering is NOT a degree
    artifact (Newman '03 §4.2.1, Maslov-Sneppen rewiring literature).

    Cost: two runs of the degree-oriented triangle kernel + one rewire
    sort — all existing plans, no new shuffle shapes.
    """
    from ..storage import release
    from .triangles import triangle_count

    spark = edges.sparkSession
    observed = triangle_count(edges)
    rw = configuration_rewire(edges, seed=seed)
    try:
        null_simple = (
            rw.where(F.col("src") != F.col("dst"))
            .select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .distinct()
        )
        null_count = triangle_count(null_simple)
    finally:
        release(rw)  # the rewire checkpoint is scratch here
    return spark.createDataFrame(
        [(int(observed), int(null_count), int(observed - null_count))],
        "n_triangles_observed bigint, n_triangles_null bigint, excess bigint",
    )
