"""Deterministic sampling for training-data pipelines.

Three operators a 100-TB corpus job needs constantly, all built on ONE
keyed hash so every decision is a pure function of (key, seed):

- ``hash_sample``     — keep a deterministic ~fraction of rows
- ``hash_split``      — disjoint, exhaustive train/valid/test assignment
- ``stratified_sample`` — at most n rows per group, uniformly-keyed

Why not df.sample()/TABLESAMPLE: those draw from a partition-local RNG, so
the kept set changes under repartitioning, retries, and scale-out — a
training pipeline needs the SAME documents selected on every run and on
every cluster size, and needs membership decidable row-locally (no global
state, no shuffle).  A keyed hash gives coordinated sampling for free:
the same key always lands on the same side, across tables too.

The hash is two rounds of a Lehmer/MINSTD multiplicative congruence mod
M31 = 2^31 - 1.  Chosen over splitmix64 deliberately: every intermediate
fits in 48 bits, so the expression is pure ANSI-safe BIGINT arithmetic —
no wraparound semantics needed (walks.py must toggle
spark.sql.ansi.enabled for its splitmix64; these stay composable in any
session) — and the identical integer expression replays in DuckDB, making
every operator hash-match-oracleable.  All three are single JVM
expressions (plus one window for the stratified cap): no Python, no
shuffle for sample/split, one partitionBy(group) exchange for the cap.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

M31 = 2_147_483_647  # 2^31 - 1 (Mersenne prime)
_A1 = 48_271  # MINSTD multiplier
_A2 = 69_621


def sample_hash(key_col: str | Column, seed: int = 42) -> Column:
    """Uniform-ish deterministic hash of an integer key into [0, M31):
    h = ((key mod M31 + seed + 1) * A1 mod M31 + 1) * A2 mod M31.
    Max intermediate M31 * A2 < 2^48 — no BIGINT overflow, ANSI-safe.
    ``key_col`` may be a column name or any integer-valued Column
    expression (e.g. a packed pair key — see graph/neighbor_sample.py)."""
    k = (F.col(key_col) if isinstance(key_col, str) else key_col).cast("long")
    h = ((k % M31 + M31) % M31 + F.lit(int(seed) % M31) + F.lit(1)) % M31
    h = (h * F.lit(_A1)) % F.lit(M31)
    return ((h + F.lit(1)) * F.lit(_A2)) % F.lit(M31)


def hash_sample(
    df: DataFrame, fraction: float, key_col: str = "doc_id", seed: int = 42
) -> DataFrame:
    """Rows whose key hashes below floor(fraction * M31) — a deterministic,
    partitioning-independent ~``fraction`` sample, coordinated across any
    table sharing the key.  Pure filter: pushes down, costs no shuffle."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(sample_hash(key_col, seed) < int(fraction * M31))


def hash_split(
    df: DataFrame,
    weights: dict[str, float] | None = None,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """Adds a ``split`` column assigning every row to exactly one named
    split with ~the given weights (insertion order defines the hash-range
    boundaries; weights must sum to 1 within 1e-9).  Disjoint and
    exhaustive by construction — the three-way contract train/valid/test
    pipelines rely on."""
    weights = weights or {"train": 0.8, "valid": 0.1, "test": 0.1}
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    if len(weights) < 1:
        raise ValueError("weights must name at least one split")
    h = sample_hash(key_col, seed)
    names = list(weights)
    cum = 0.0
    expr = None
    for name in names[:-1]:
        cum += weights[name]
        cond = h < int(cum * M31)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(names[-1])
    split = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", split)


def stratified_sample(
    df: DataFrame,
    group_col: str,
    n_per_group: int,
    key_col: str = "doc_id",
    seed: int = 42,
) -> DataFrame:
    """At most ``n_per_group`` rows per distinct ``group_col`` value,
    chosen by ascending key hash (= a uniform without-replacement draw,
    deterministic under any partitioning; key breaks hash ties).  The
    per-class rebalancing cap every curriculum/mixture job needs.  One
    window exchange on the group key; skewed groups cost their row count,
    not their pair count."""
    if n_per_group < 1:
        raise ValueError("n_per_group must be >= 1")
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(
        sample_hash(key_col, seed).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= n_per_group)
    )
