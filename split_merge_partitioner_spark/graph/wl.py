"""Weisfeiler-Leman (1-WL / color refinement) vertex fingerprints.

The classic isomorphism-refinement iteration — color_{t+1}(v) =
HASH(color_t(v), {{color_t(u) : u in N(v)}}) — is also the standard
structural-feature generator for graph ML (WL kernels, GIN features) and a
cheap "did the topology change" fingerprint for graph diffs.

Hash discipline (the walks.py / hyperanf.py recipe): the multiset is
combined ORDER-INVARIANTLY as a wrapping 64-bit sum of splitmix64(color_u),
added to the vertex's own color, and re-finalized with splitmix64 — four
wrapping BIGINT expressions per round, zero Python, and bit-replayable in
DuckDB via the HUGEINT mod-2^64 machinery.  Non-cryptographic by design:
a wrapping-sum multiset hash can collide adversarially, which is
irrelevant for refinement fingerprints (documented; the same contract as
every WL implementation that hashes).

Two same-degree vertices whose neighborhoods differ split into different
colors within diameter rounds; the DISTINCT color count per round is the
classic refinement-progress signal.

Plan shape per round: the static doubled adjacency is hash-partitioned
once by the gather key and reused; each round is one co-located join
(colors arrive partitioned by vertex from the previous groupBy) + ONE
map-side-combined exchange — the exact-integer superstep family's plan
(eigencentrality/hits), with wrapping adds instead of decimal sums.

Requires spark.sql.ansi.enabled=false for Java wraparound (asserted), like
walks.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from .walks import _sm64

_MASK63 = (1 << 63) - 1


def wl_colors(edges: DataFrame, n_rounds: int = 3) -> DataFrame:
    """(vertex, color) after ``n_rounds`` of 1-WL refinement over the
    undirected graph; color_0 = splitmix64(degree), output masked to 63
    bits (non-negative BIGINT, engine-portable)."""
    if n_rounds < 0:
        raise ValueError("n_rounds must be >= 0")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # flip ANSI off for Java wraparound, restore on exit (walks.py contract)
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    adj = None
    try:
        und = edges.select(F.col("src").alias("v"), F.col("dst").alias("u")).unionAll(
            edges.select(F.col("dst").alias("v"), F.col("src").alias("u"))
        )
        adj = und.repartition(shuffle_n, "u").localCheckpoint(eager=True)
        colors = (
            adj.groupBy("v")
            .agg(F.count(F.lit(1)).alias("degree"))
            .select("v", _sm64(F.col("degree")).alias("c"))
            .repartition(shuffle_n, "v")
            .localCheckpoint(eager=True)
        )
        for _ in range(n_rounds):
            prev = colors
            nbr = (
                adj.join(
                    colors.select(F.col("v").alias("u"), "c").hint("shuffle_hash"),
                    "u",
                )
                .groupBy("v")
                .agg(F.sum(_sm64(F.col("c"))).alias("s"))  # wrapping multiset sum
            )
            colors = (
                prev.join(nbr.hint("shuffle_hash"), "v")
                .select("v", _sm64(F.col("c") + F.col("s")).alias("c"))
                .localCheckpoint(eager=True)
            )
            release(prev)
        # materialize the masked output while ANSI is still off (the mask
        # itself is overflow-free, but the lazy _sm64 lineage would not be),
        # then drop the pre-mask round checkpoint it was derived from
        out = colors.select(
            F.col("v").alias("vertex"),
            F.col("c").bitwiseAND(F.lit(_MASK63)).alias("color"),
        ).localCheckpoint(eager=True)
        release(colors)
        return out
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        if adj is not None:
            release(adj)


def graph_fingerprint(edges: DataFrame, n_rounds: int = 3) -> DataFrame:
    """One row — an isomorphism-invariant whole-graph fingerprint:

    (n_vertices, n_edges, n_colors, color_xor, color_sum_mod)

    over the 63-bit :func:`wl_colors` output after ``n_rounds`` of 1-WL:
    distinct-color count, bitwise XOR of all vertex colors, and their sum
    mod 2^63 (DECIMAL(38) partial sums — exact with ANSI on, no wraparound
    needed).  Two graphs with different fingerprints are definitely
    non-isomorphic; equal fingerprints mean "1-WL-equivalent up to the
    order-invariant color digest" — the standard cheap screen for snapshot
    dedup, change detection, and dataset versioning of graph corpora.

    Plan: wl_colors' one-exchange-per-round superstep, then a single
    map-side-combined global aggregate; the colors checkpoint is released
    before return (the 1-row result is checkpointed instead).
    """
    colors = wl_colors(edges, n_rounds)
    try:
        m = edges.select(F.count(F.lit(1)).alias("n_edges"))
        out = (
            colors.agg(
                F.count(F.lit(1)).alias("n_vertices"),
                F.countDistinct("color").alias("n_colors"),
                F.expr("bit_xor(color)").alias("color_xor"),
                (F.sum(F.col("color").cast("decimal(38,0)"))
                 % F.expr("CAST(9223372036854775808 AS DECIMAL(38,0))"))
                .cast("long")
                .alias("color_sum_mod"),
            )
            .crossJoin(m)
            .select(
                "n_vertices", F.col("n_edges").cast("long").alias("n_edges"),
                F.col("n_colors").cast("long").alias("n_colors"),
                "color_xor", "color_sum_mod",
            )
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        release(colors)


def wl_quotient(edges: DataFrame, n_rounds: int = 3) -> DataFrame:
    """(c_src, c_dst, n_edges, n_src, n_dst): the 1-WL quotient supergraph —
    vertices contracted into their round-``n_rounds`` refinement classes,
    super-edges counting the original edges between each (canonical) class
    pair, annotated with both class sizes.

    This is role-based graph summarization: structurally equivalent
    vertices (up to 1-WL) collapse to one supernode, so the quotient is the
    smallest relation that still answers "how do the structural roles wire
    to each other" — the compression step before motif dashboards or
    role-level diffing of two crawl snapshots.  The quotient of a graph
    with k WL classes has at most k supernodes regardless of n, so the
    output is dashboard-sized even at 100 TB while its derivation stays
    fully distributed (two hash joins of the n-row color relation onto the
    edge relation + one map-side-combined groupBy; class sizes broadcast
    back onto the ≤k²-row super-edge relation).

    Input is canonicalized (src<dst, self-loops dropped, deduped) so colors
    and super-edge counts are derived from the same edge multiset.
    """
    canon = (
        edges.select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    cols = wl_colors(canon, n_rounds=n_rounds)
    try:
        sizes = cols.groupBy("color").agg(F.count(F.lit(1)).cast("long").alias("nv"))
        ce = (
            canon.join(
                cols.select(F.col("vertex").alias("src"), F.col("color").alias("cu")),
                "src",
            )
            .join(
                cols.select(F.col("vertex").alias("dst"), F.col("color").alias("cv")),
                "dst",
            )
            .groupBy(
                F.least("cu", "cv").alias("c_src"),
                F.greatest("cu", "cv").alias("c_dst"),
            )
            .agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
        )
        out = (
            ce.join(
                F.broadcast(sizes.select(F.col("color").alias("c_src"),
                                         F.col("nv").alias("n_src"))),
                "c_src",
            )
            .join(
                F.broadcast(sizes.select(F.col("color").alias("c_dst"),
                                         F.col("nv").alias("n_dst"))),
                "c_dst",
            )
            .select("c_src", "c_dst", "n_edges", "n_src", "n_dst")
            .localCheckpoint(eager=True)
        )
        return out
    finally:
        release(cols)
        release(canon)
