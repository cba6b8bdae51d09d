"""Partition agreement: exact pair-counting Rand index between two vertex
labelings (community assignments, core levels, degree classes, ...).

Clustering comparison is the standard way to validate one community
structure against another (Rand 1971; Hubert-Arabie ARI 1985).  The
pair-counting identity makes it computable without materializing the
O(n^2) pair space: with contingency counts n_ij = |class i of A ∩ class j
of B|, row sums a_i, column sums b_j and n joined vertices,

    agree  = sum_ij C(n_ij,2)                      (same in both)
           + C(n,2) - sum_i C(a_i,2) - sum_j C(b_j,2) + sum_ij C(n_ij,2)
                                                   (split in both)
    Rand   = agree / C(n,2)

Everything is an exact BIGINT (one groupBy for the contingency, two for
the marginals — three small exchanges; no pair enumeration), and the
reported ``rand_index_ppm`` is a floor division of non-negative integers,
so the cross-engine hash match is exact.  The adjusted index is derivable
from the emitted components:
    ARI = 2*(sum_ij*C(n,2) - sum_a*sum_b)
          / (C(n,2)*(sum_a + sum_b) - 2*sum_a*sum_b)
(left to the consumer: it can be negative, and floor-vs-truncate division
of negatives differs between engines — the components are the contract).
At 10^9+ vertices the C(n,2)-scale products exceed int64 — cast the
emitted components to DECIMAL(38,0) before combining (the exact-integer
superstep family's convention); the components themselves stay in range
(each is at most C(n,2) ~ 5e17 < 2^63).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _exact_div(num, den):
    # floor division of non-negative integers, exact at ANY magnitude: the
    # multiply/mod/subtract run in DECIMAL(38,0) (agree can reach C(n,2)
    # ~ 5e17, so 10^6 * agree would wrap BIGINT at ~4.3M joined vertices,
    # and a double division would round above 2^53), and the final divide
    # is of an exactly-divisible numerator, so the cast back to long is
    # lossless for any ppm-scale quotient
    num_d = num.cast("decimal(38,0)")
    den_d = den.cast("decimal(38,0)")
    return ((num_d - F.pmod(num_d, den_d)) / den_d).cast("long")


def _c2(col):
    # n*(n-1) is even, so a right shift is the exact integer C(n,2) —
    # never a double division (which would round above 2^53)
    return F.shiftright((col * (col - F.lit(1))).cast("long"), 1)


def partition_agreement(
    a: DataFrame,
    b: DataFrame,
    label_a: str = "label",
    label_b: str = "label",
) -> DataFrame:
    """One-row DataFrame (n_vertices, n_pairs, sum_ij_c2, sum_a_c2,
    sum_b_c2, rand_index_ppm) comparing two (vertex, label) DataFrames
    over their JOINED vertex set (inner join — vertices labeled by only
    one side are excluded; label values are arbitrary and independent
    between the two sides)."""
    ja = a.select("vertex", F.col(label_a).alias("la"))
    jb = b.select("vertex", F.col(label_b).alias("lb"))
    j = ja.join(jb, "vertex").persist()
    try:
        cont = j.groupBy("la", "lb").agg(F.count(F.lit(1)).alias("nij"))
        sij = cont.agg(
            F.sum(_c2(F.col("nij"))).cast("long").alias("sum_ij_c2")
        )
        sa = (
            j.groupBy("la")
            .agg(F.count(F.lit(1)).alias("ai"))
            .agg(F.sum(_c2(F.col("ai"))).cast("long").alias("sum_a_c2"))
        )
        sb = (
            j.groupBy("lb")
            .agg(F.count(F.lit(1)).alias("bj"))
            .agg(F.sum(_c2(F.col("bj"))).cast("long").alias("sum_b_c2"))
        )
        nn = j.agg(F.count(F.lit(1)).cast("long").alias("n_vertices"))
        out = (
            nn.crossJoin(sij)
            .crossJoin(sa)
            .crossJoin(sb)
            .select(
                "n_vertices",
                _c2(F.col("n_vertices")).cast("long").alias("n_pairs"),
                "sum_ij_c2",
                "sum_a_c2",
                "sum_b_c2",
            )
            .select(
                "*",
                F.when(F.col("n_pairs") > 0,
                       _exact_div(
                           F.lit(1_000_000).cast("decimal(38,0)") * (
                               F.col("sum_ij_c2") + F.col("n_pairs")
                               - F.col("sum_a_c2") - F.col("sum_b_c2")
                               + F.col("sum_ij_c2")
                           ).cast("decimal(38,0)"),
                           F.col("n_pairs"),
                       ))
                .otherwise(F.lit(1_000_000).cast("long"))
                .alias("rand_index_ppm"),
            )
        )
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        from ..storage import release

        release(j)
