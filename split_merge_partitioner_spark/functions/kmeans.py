"""One exact-integer Lloyd step over the embeddings table: the building
block the IVF quantizer (functions/similarity.py) trains with, exposed as a
standalone, cross-engine-verifiable operator pair.

Embeddings are quantized once — q = cast(round(x * scale) as bigint) per
dimension — so every distance, argmin, and centroid numerator is exact
64-bit integer arithmetic: bit-identical under any partitioning, retry, or
engine (a double-sum formulation would hash-mismatch across engines on
addition order alone).

Scale shape (10^9 vectors):

- the k initial centroids are the k smallest vec_ids — k rows collected to
  the driver (constant-size, the hits.py-sanctioned collect class) and
  inlined as literals, i.e. broadcast by construction;
- ``kmeans_assign`` is then a single narrow scan: per row, k zip_with
  integer dot products inside one codegen stage, argmin via array_min over
  (dist, cid) structs — ZERO shuffles;
- ``kmeans_update`` adds one exchange: posexplode to (cid, dim) and a
  partial-aggregated groupBy over k*dim groups — the numerators of the next
  centroid set, exact integers (the caller divides by n_members to get the
  float centroid when it actually needs one).

No counterpart in the reference engine; this covers the
similarity-search/training-data side of the workload (cf. SURVEY.md §2's
LLM-pipeline extensions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SCALE = 1000


def _quantized(emb: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("vec_id"),
        # x is float32 in the table: promote to double explicitly BEFORE the
        # multiply so Spark and the DuckDB oracle round the same product
        # (float*int stays FLOAT in DuckDB otherwise)
        F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(SCALE))).cast("long"),
        ).alias("q"),
    )


def _initial_centroids(q: DataFrame, k: int) -> list[tuple[int, list[int]]]:
    """The k smallest vec_ids, as (cid, qvec) literals.  Constant-size
    driver collect (k rows), deterministic under any partitioning."""
    rows = q.orderBy("vec_id").limit(k).collect()
    if len(rows) < k:
        raise ValueError(f"k={k} centroids requested but only {len(rows)} vectors")
    return [(r.vec_id, list(r.q)) for r in rows]


def _assigned_q(
    emb: DataFrame, k: int, vec_col: str, id_col: str
) -> DataFrame:
    """(vec_id, q, cid, dist) in ONE codegen'd scan — shared by assign and
    update so the update never re-joins two derivations of the same scan."""
    q = _quantized(emb, vec_col, id_col)
    return _assign_to(q, _initial_centroids(q, k))


def kmeans_assign(
    emb: DataFrame, k: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(vec_id, cid, dist): nearest of the k seed centroids by quantized
    squared L2; ties -> smallest centroid id (array_min over (dist, cid)
    structs is lexicographic).  Zero shuffles — one codegen'd scan."""
    return _assigned_q(emb, k, vec_col, id_col).select("vec_id", "cid", "dist")


def kmeans_update(
    emb: DataFrame, k: int = 8, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """(cid, dim_idx, n_members, sum_q): exact-integer numerators of the
    post-assignment centroids (dim_idx 1-based).  One partial-aggregated
    exchange over k*dim groups, on top of the same single assign scan."""
    return (
        _assigned_q(emb, k, vec_col, id_col)
        .select("cid", F.posexplode("q").alias("dim0", "qv"))
        .groupBy("cid", (F.col("dim0") + 1).alias("dim_idx"))
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("qv").alias("sum_q"),
        )
    )


def _assign_to(q: DataFrame, cents: list[tuple[int, list[int]]]) -> DataFrame:
    """(vec_id, q, cid, dist) against an explicit centroid literal list —
    one codegen'd scan, zero shuffles (the kmeans_assign kernel with the
    centroids parameterized)."""
    candidates = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        F.col("q"),
                        F.array(*[F.lit(v).cast("long") for v in cvec]),
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(cid).cast("long").alias("cid"),
            )
            for cid, cvec in cents
        ]
    )
    best = F.array_min(candidates)
    return q.select("vec_id", "q", best["cid"].alias("cid"), best["dist"].alias("dist"))


def kmeans_train(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """``n_iter`` full Lloyd iterations from the k-smallest-id seed
    centroids; returns the FINAL assignment (vec_id, cid, dist).

    Between iterations each centroid moves to the exact integer floor-mean
    of its members — floor(sum_q / n) computed in double (exact: |sum_q|
    stays far below 2^53), so every iteration remains bit-replayable in
    SQL.  Empty clusters keep their previous centroid (deterministic, no
    reseeding).  Centroid labels are the seed vec_ids' ranks 0..k-1 -> the
    seed ids themselves, stable across iterations.

    Scale shape per iteration: one zero-shuffle assign scan + one
    partial-aggregated k*dim exchange; the k*dim numerators (constant
    size, e.g. 8x64 rows) collect to the driver and inline as the next
    iteration's literals — the same constant-size-collect contract as the
    seed draw.  The quantized input is localCheckpointed once so Lloyd
    iterations re-scan a materialized relation, not the parquet plan.
    """
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    q = _quantized(emb, vec_col, id_col).localCheckpoint(eager=True)
    from ..storage import release

    try:
        cents = _initial_centroids(q, k)
        dim = len(cents[0][1])
        assigned = _assign_to(q, cents)
        for _ in range(n_iter - 1):
            rows = (
                assigned.select("cid", F.posexplode("q").alias("dim0", "qv"))
                .groupBy("cid", "dim0")
                .agg(F.count(F.lit(1)).alias("n"), F.sum("qv").alias("s"))
                .collect()
            )
            sums: dict[int, dict[int, tuple[int, int]]] = {}
            for r in rows:
                sums.setdefault(int(r.cid), {})[int(r.dim0)] = (int(r.s), int(r.n))
            import math

            new_cents = []
            for cid, cvec in cents:
                got = sums.get(cid, {})
                new_cents.append(
                    (
                        cid,
                        [
                            int(math.floor(got[d][0] / got[d][1]))
                            if d in got
                            else cvec[d]
                            for d in range(dim)
                        ],
                    )
                )
            cents = new_cents
            assigned = _assign_to(q, cents)
        # materialized BEFORE the finally releases q: a lazy result over the
        # checkpointed input would lose its blocks (the betweenness rule)
        return assigned.select("vec_id", "cid", "dist").localCheckpoint(eager=True)
    finally:
        release(q)
