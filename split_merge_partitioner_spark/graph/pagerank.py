"""PageRank over a vertex-cut partitioned undirected edge table.

Semantics (matching the NumPy oracle in tests/oracles.py, and the paper's
PowerGraph PR over FSM partitions, full.pdf §5.4): undirected graph, each edge
(u,v) sends rank(u)/deg(u) to v and rank(v)/deg(v) to u per superstep;
r' = (1-d)/n + d * gathered;  damping d = 0.85; converged when
max|r' - r| <= tol.

Two execution modes:
- mode="gas":  the north-star path — per-bucket CSR scatter inside
  cogroup().applyInPandas (Arrow blocks), mirror-rank shuffle O(RF*n).
- mode="join": pure-DataFrame fallback (edges JOIN ranks on both endpoints,
  groupBy(vertex).sum) — lets Catalyst/AQE pick the physical plan; used to
  cross-check the GAS kernel and as the no-partitioner baseline.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.edges import degrees as degrees_of
from .gas import at_boundary, truncate

DAMPING = 0.85


def _scatter_kernel(key: tuple, state: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket CSR gather-scatter: emit (vertex, partial rank mass)."""
    if len(edges) == 0 or len(state) == 0:
        return pd.DataFrame({"vertex": np.empty(0, np.int64), "partial": np.empty(0, np.float64)})
    verts = state["vertex"].to_numpy(np.int64)
    order = np.argsort(verts, kind="stable")
    verts = verts[order]
    contrib = (state["rank"].to_numpy(np.float64) / state["degree"].to_numpy(np.float64))[order]
    s = np.searchsorted(verts, edges["src"].to_numpy(np.int64))
    d = np.searchsorted(verts, edges["dst"].to_numpy(np.int64))
    partial = np.zeros(len(verts), dtype=np.float64)
    np.add.at(partial, d, contrib[s])
    np.add.at(partial, s, contrib[d])
    return pd.DataFrame({"vertex": verts, "partial": partial})


def pagerank(
    edges: DataFrame,
    assigned: DataFrame | None = None,
    replicas: DataFrame | None = None,
    tol: float = 1e-8,
    max_iter: int = 100,
    damping: float = DAMPING,
    mode: str = "gas",
    check_every: int = 5,
) -> tuple[DataFrame, dict]:
    """Returns (ranks DataFrame (vertex, rank), run info dict).

    For mode="gas", pass ``assigned`` (src, dst, bucket); replicas is derived
    if not given.  Ranks sum to ~1 (uniform init 1/n).
    """
    spark = edges.sparkSession
    deg = degrees_of(edges).persist()
    n = deg.count()
    state = deg.select("vertex", "degree", (F.lit(1.0) / F.lit(float(n))).alias("rank")).persist()
    state.count()

    if mode == "gas":
        assert assigned is not None, "gas mode needs the partition assignment"
        if replicas is None:
            from ..operators.stats import replica_sets

            replicas = replica_sets(assigned)
        replicas = replicas.persist()
        replicas.count()
        # alias the grouping key: replicas and edges share lineage (both derive
        # from `assigned`), and cogroup would see an ambiguous attribute
        edges_by_bucket = assigned.select(F.col("bucket").alias("ebkt"), "src", "dst").persist()
        edges_by_bucket.count()

    base = (1.0 - damping) / n
    info = {"iterations": 0, "converged": False, "n": n}
    last_checkpoint = state  # state at the previous boundary (for block delta)
    for it in range(max_iter):
        if mode == "gas":
            mirror = replicas.join(state, "vertex").select("bucket", "vertex", "rank", "degree")
            partials = (
                mirror.groupby("bucket")
                .cogroup(edges_by_bucket.groupby("ebkt"))
                .applyInPandas(_scatter_kernel, schema="vertex long, partial double")
            )
            gathered = partials.groupBy("vertex").agg(F.sum("partial").alias("gathered"))
        else:
            contrib = state.select("vertex", (F.col("rank") / F.col("degree")).alias("c"))
            out = edges.join(
                contrib.withColumnRenamed("vertex", "src"), "src"
            ).select(F.col("dst").alias("vertex"), "c")
            back = edges.join(
                contrib.withColumnRenamed("vertex", "dst"), "dst"
            ).select(F.col("src").alias("vertex"), "c")
            gathered = out.unionAll(back).groupBy("vertex").agg(F.sum("c").alias("gathered"))

        new_state = (
            deg.join(gathered, "vertex", "left")
            .select(
                "vertex",
                "degree",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("gathered"), F.lit(0.0))).alias("rank"),
            )
        )
        state = new_state  # lazy chain between boundaries
        info["iterations"] = it + 1
        if at_boundary(it, check_every) or it == max_iter - 1:
            prev = last_checkpoint
            state = truncate(state, None)
            last_checkpoint = state
            if tol > 0:
                # block delta over check_every supersteps — conservative
                delta = (
                    state.join(prev.select("vertex", F.col("rank").alias("old")), "vertex")
                    .agg(F.max(F.abs(F.col("rank") - F.col("old"))).alias("d"))
                    .collect()[0]["d"]
                )
                prev.unpersist()
                if delta is not None and delta <= tol:
                    info["converged"] = True
                    info["delta"] = float(delta)
                    break
            else:
                prev.unpersist()
    deg.unpersist()
    return state.select("vertex", "rank"), info
