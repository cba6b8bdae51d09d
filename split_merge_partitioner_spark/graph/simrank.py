"""Monte-Carlo SimRank — link-based similarity for query pairs, estimated
from coupled random-walk meeting times (Fogaras & Rácz, "Scaling link-based
similarity search", WWW 2005: s(u,v) = E[C^τ], τ = first time the two
walks occupy the same vertex at the same step).

Built ON the deterministic walk corpus (graph/walks.py): walk w from u and
walk w from v are independent splitmix64 hash chains (seeded per (start,
walk)), and the estimator couples them BY WALK INDEX — the standard MC
SimRank pairing.  Because the corpus is a pure function of (edges, seed),
the meeting times — and hence the scores — are bit-stable across engines,
partitionings, and retries; the DuckDB oracle replays walks AND meetings.

Exact-integer contract: with C = c_num/c_den, the per-pair score
Σ_w C^{τ_w} is reported as the integer numerator

    score_num = Σ_w c_num^{τ_w} · c_den^{L − τ_w}

over the common denominator W · c_den^L (documented, constant) — no float
ever enters the result.  n_meets and min_tau ride along; pairs whose walks
never meet within L steps report (0, NULL, 0).

Degenerate-coupling caveat: for u == v both sides are the SAME hash chain
(they meet at every step), so pairs must have u ≠ v — validated.

Scale: the corpus costs one exchange per step (walks.py); the meeting join
is corpus ⋈ pairs (semi-pruned to pair endpoints) ⋈ corpus on
(v, walk, step, vertex) — two shuffles over |pairs|·W·L slim rows.  W is
the accuracy dial (error ~ 1/√W); L bounds τ like SimRank's usual
truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from .walks import random_walks


def simrank_mc(
    edges: DataFrame,
    pairs: DataFrame,
    walk_length: int = 6,
    walks_per_vertex: int = 2,
    c_num: int = 6,
    c_den: int = 10,
    seed: int = 42,
    assume_canonical: bool = False,
) -> DataFrame:
    """(u, v, n_meets, min_tau, score_num) for each row of ``pairs``
    (columns u, v; u ≠ v): coupled-walk meeting stats and the exact
    integer SimRank-score numerator over W·c_den^walk_length."""
    if not 0 < c_num < c_den:
        raise ValueError("need 0 < c_num < c_den (C in (0,1))")
    if c_den ** walk_length >= 2 ** 53:
        # the weight terms are computed via double pow on both engines —
        # exact only below 2^53
        raise ValueError("c_den**walk_length must stay below 2^53")
    spark = edges.sparkSession
    if pairs.where(F.col("u") == F.col("v")).limit(1).count() > 0:
        raise ValueError(
            "pairs must have u != v: equal endpoints share the hash chain "
            "(degenerate coupling, score trivially C)"
        )
    corpus = random_walks(
        edges,
        walk_length=walk_length,
        walks_per_vertex=walks_per_vertex,
        seed=seed,
        assume_canonical=assume_canonical,
    )
    try:
        cu = corpus.select(F.col("start").alias("u"), "walk", "step", "vertex")
        cv = corpus.select(F.col("start").alias("v"), "walk", "step", "vertex")
        met = (
            pairs.join(cu, "u")
            .join(cv, ["v", "walk", "step", "vertex"])
            .where(F.col("step") >= 1)
        )
        tau = met.groupBy("u", "v", "walk").agg(F.min("step").alias("tau"))
        # c_num^tau · c_den^(L−tau): double pow is exact below 2^53
        # (validated above); both engines compute the identical
        # small-integer powers
        wgt = F.expr(
            f"CAST(power({c_num}, tau) AS BIGINT)"
            f" * CAST(power({c_den}, {walk_length} - tau) AS BIGINT)"
        )
        agg = tau.select("u", "v", "tau", wgt.alias("wgt")).groupBy("u", "v").agg(
            F.count(F.lit(1)).cast("long").alias("n_meets"),
            F.min("tau").cast("long").alias("min_tau"),
            F.sum("wgt").cast("long").alias("score_num"),
        )
        return (
            pairs.join(agg, ["u", "v"], "left")
            .select(
                "u",
                "v",
                F.coalesce("n_meets", F.lit(0)).cast("long").alias("n_meets"),
                F.col("min_tau").cast("long").alias("min_tau"),
                F.coalesce("score_num", F.lit(0)).cast("long").alias("score_num"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        release(corpus)
