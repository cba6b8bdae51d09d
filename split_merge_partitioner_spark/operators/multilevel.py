"""Multilevel k-way vertex partitioning — the METIS scheme (Karypis &
Kumar, SIAM J. Sci. Comput. 1998) assembled from the engine's own
oracle-checked kernels:

    coarsen (heavy-edge matching + contraction, graph/matching.py)
      × levels
    → partition the coarsest graph (Spinner LP, operators/spinner.py)
    → project labels back through the mapping chain (broadcast joins)

Why multilevel at scale: LP/KL-style refiners move one vertex per
decision, so on the full graph they need O(diameter·n) moves to shift a
community across a cut; after log-halving the graph, one coarse move
relocates an entire contracted cluster, and the projection replays it for
free.  This is the standard answer for balanced VERTEX partitioning of a
web graph (the engine's edge partitioners — FSM/DBH/HEP — solve the dual
problem; v2e consumes outputs like this one).

Determinism: matching uses the seeded-hash priority rounds, Spinner the
keyed Lehmer init — both pure functions of (edges, seed), so the full
pipeline is repartition/retry-stable end to end.

Isolated supervertices (all edges contracted away at some level) never
reach Spinner's universe; their labels backfill with the SAME keyed
Lehmer rule Spinner initializes with — deterministic and balanced.

Plan: per level, the matching's O(log m) priority rounds + two mapping
joins + one map-side-combined contraction groupBy; projection is one
(vertex, rep) ⋈ (rep, label) join per level over shrinking relations.
Nothing driver-side but per-level scalars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

# the isolated-supervertex backfill reuses Spinner's own init rule
# (sample_hash % k) so the whole label surface follows one documented hash


def multilevel_partition(
    edges: DataFrame,
    k: int,
    levels: int = 3,
    rounds: int = 8,
    seed: int = 42,
) -> tuple[DataFrame, dict]:
    """((vertex, label), info): balanced k-way vertex partition of the
    undirected canonical edge table via ``levels`` heavy-edge coarsening
    steps, Spinner LP on the coarsest graph, and label projection back.
    info: per-level (n, m), coarsest size, spinner rounds/convergence."""
    from ..graph.matching import coarsen_graph
    from .spinner import spinner_partition

    if k < 2:
        raise ValueError("k must be >= 2")
    if levels < 1:
        raise ValueError("levels must be >= 1")
    cur = edges.select("src", "dst", F.lit(1).cast("long").alias("weight"))
    maps: list[DataFrame] = []
    level_info = []
    scratch: list[DataFrame] = []
    try:
        for _ in range(levels):
            m_before = cur.count()
            if m_before == 0:
                break
            coarse, mapping, minfo = coarsen_graph(cur, weight_col="weight", seed=seed)
            coarse = coarse.localCheckpoint(eager=True)
            mapping = mapping.localCheckpoint(eager=True)
            scratch.append(coarse)
            maps.append(mapping)
            m_after = coarse.count()
            level_info.append(
                {"m_before": m_before, "m_after": m_after,
                 "matching_rounds": minfo.get("rounds", None)}
            )
            cur = coarse
            if m_after == 0 or m_after >= m_before:  # no shrink: stop early
                break
        if cur.isEmpty():
            # fully contracted (or empty input): every vertex backfills
            labels = None
            sinfo = {"rounds_run": 0, "converged": True}
        else:
            labels, sinfo = spinner_partition(
                cur.select("src", "dst"), k=k, rounds=rounds, seed=seed
            )
            scratch.append(labels)
        # project back: label(rep) -> label(vertex), level by level; reps
        # Spinner never saw backfill with Spinner's own init hash
        from ..functions.sampling import sample_hash

        backfill = (sample_hash("vertex", seed) % F.lit(k)).cast("long")
        out = labels
        for mapping in reversed(maps):
            rep_lab = (
                out.select(F.col("vertex").alias("rep"), "label")
                if out is not None
                else None
            )
            joined = (
                mapping.join(rep_lab, "rep", "left")
                if rep_lab is not None
                else mapping.select("vertex", F.lit(None).cast("long").alias("label"))
            )
            out = (
                joined.select(
                    "vertex", F.coalesce("label", backfill).alias("label")
                )
                .localCheckpoint(eager=True)
            )
            scratch.append(out)
        if out is None:  # levels produced no maps (empty input)
            out = edges.sparkSession.createDataFrame([], "vertex long, label long")
        result = out.select("vertex", F.col("label").cast("long").alias("label"))
        result = result.localCheckpoint(eager=True)
        info = {
            "levels_run": len(maps),
            "level_info": level_info,
            "spinner": {kk: sinfo.get(kk) for kk in ("rounds_run", "converged")},
            "k": k,
        }
        return result, info
    finally:
        for df in scratch + maps:
            release(df)
