"""Louvain community detection, phase 1 (local move) — synchronous,
derandomized, exact-integer — plus the community contraction that
completes one Louvain level (Blondel et al. 2008).

The reference engine partitions the graph but ships no community
detection; this pairs with labelprop.py (pure propagation) and
modularity.py (the Q scorer) to close the clustering story the way a
link-graph deployment uses it: local-move rounds -> contract -> repeat on
the coarse graph (the contraction primitive mirrors matching.py's
METIS-style coarsen_graph, which contracts a MATCHING; this contracts a
COMMUNITY ASSIGNMENT).

Semantics (mirrored exactly by the DuckDB oracle replay):
- state_0: every vertex its own community.
- per synchronous round r, each vertex u evaluates every NEIGHBOR
  community C plus staying put.  Classic Louvain gain comparison,
  multiplied through by 2m to stay in BIGINTs:
      score(u, C) = 2m * w(u, C) - k_u * (tot(C) - [C = cu] * k_u)
  where w(u, C) = #edges from u into C, k_u = degree, tot(C) = summed
  degree of C's members (all integers — score differences are exactly
  2m^2 * the true modularity delta, so the argmax IS the Louvain argmax).
- argmax with deterministic tie-break (score desc, community asc).
- PARITY GATING (the Grappolo/Vite synchronous-Louvain rule): only
  vertices with (u + r) % 2 == 0 may move in round r.  Two adjacent
  vertices can otherwise chase each other's communities forever
  (synchronous A<->B oscillation); gating makes each round's moves
  one-sided and deterministic.  n_rounds is a FIXED budget — this is a
  local-move phase, not a fixpoint claim (run more levels instead of
  more rounds; each level shrinks the graph geometrically).

Scale shape per round: one exchange for neighbor-community weights
(groupBy(u, comm)), one for community totals (groupBy(comm) — partial
aggregated, |C| rows), the candidate join keyed by u (co-partitioned with
the state), one row_number window over u.  State is exactly n rows; no
per-root or per-pair blowup.  Overflow guard: scores stay under 2^63 for
2m * k_max < 2^63 — beyond that (m ~ 10^12 with multi-million-degree
hubs) swap the score to DECIMAL(38,0) like the exact superstep family;
the fail-fast below names the remedy.

Cited reference contract: none (capability beyond the C++ engine);
the modularity arithmetic matches modularity.py's integer formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from split_merge_partitioner_spark.storage import release


def louvain_local_move(
    edges: DataFrame, n_rounds: int = 4, weight_col: str | None = None
) -> tuple[DataFrame, dict]:
    """((vertex, comm), info) after ``n_rounds`` parity-gated synchronous
    local-move rounds over the undirected (src, dst[, weight]) table.
    info: n_rounds, moves (list, per round), n_communities.

    ``weight_col`` names an integer edge multiplicity (the contracted
    graphs of later levels); None = unit weights.  Self-loop rows
    (src = dst, produced by contraction) contribute 2*w to their vertex's
    weighted degree — the standard Louvain convention — and nothing to any
    w(u, C) (u's loop moves WITH u, so it cancels from every comparison).
    """
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    w0 = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    e = edges.select(F.col("src"), F.col("dst"), w0.alias("w"))
    proper = e.where(F.col("src") != F.col("dst"))
    loops = e.where(F.col("src") == F.col("dst"))
    und = proper.select(
        F.col("src").alias("u"), F.col("dst").alias("v"), "w"
    ).unionAll(proper.select(F.col("dst").alias("u"), F.col("src").alias("v"), "w"))
    scratch: list[DataFrame] = []
    try:
        if weight_col is not None and e.where(F.col("w") <= 0).limit(1).count():
            raise ValueError(
                f"louvain_local_move: non-positive weights in {weight_col!r} "
                "(integer multiplicities required)"
            )
        deg = (
            und.select("u", "w")
            .unionAll(loops.select(F.col("src").alias("u"), (F.col("w") * 2).alias("w")))
            .groupBy("u")
            .agg(F.sum("w").alias("k"))
        ).localCheckpoint(eager=True)
        scratch.append(deg)
        row = deg.agg(
            F.sum("k").alias("m2"), F.max("k").alias("kmax")
        ).collect()[0]
        m2, kmax = int(row["m2"]), int(row["kmax"])
        if m2 * kmax >= (1 << 62):
            raise ValueError(
                "louvain_local_move: 2m * k_max >= 2^62 would overflow the "
                "BIGINT score; re-express the score in DECIMAL(38,0) (see "
                "module docstring) for graphs this large"
            )
        state = deg.select("u", F.col("u").alias("comm")).localCheckpoint(
            eager=True
        )
        scratch.append(state)
        info: dict = {"n_rounds": n_rounds, "moves": []}
        for r in range(1, n_rounds + 1):
            nbr_comm = und.join(
                state.select(F.col("u").alias("v"), F.col("comm").alias("cv")),
                "v",
            )
            nc = nbr_comm.groupBy("u", "cv").agg(F.sum("w").alias("w"))
            tot = (
                state.join(deg, "u")
                .groupBy("comm")
                .agg(F.sum("k").alias("tot"))
            )
            cand = (
                nc.select("u", F.col("cv").alias("c"), "w")
                .unionAll(
                    state.select(
                        "u", F.col("comm").alias("c"), F.lit(0).cast("long").alias("w")
                    )
                )
                .groupBy("u", "c")
                .agg(F.sum("w").alias("w"))
            )
            scored = (
                cand.join(state, "u")
                .join(deg, "u")
                .join(tot.select(F.col("comm").alias("c"), "tot"), "c")
                .select(
                    "u",
                    "c",
                    "comm",
                    (
                        F.lit(m2) * F.col("w")
                        - F.col("k")
                        * (
                            F.col("tot")
                            - F.when(F.col("c") == F.col("comm"), F.col("k")).otherwise(
                                F.lit(0)
                            )
                        )
                    ).alias("score"),
                )
            )
            w_best = Window.partitionBy("u").orderBy(
                F.col("score").desc(), F.col("c").asc()
            )
            best = (
                scored.withColumn("rn", F.row_number().over(w_best))
                .where(F.col("rn") == 1)
                .select(
                    "u",
                    F.when((F.col("u") + F.lit(r)) % 2 == 0, F.col("c"))
                    .otherwise(F.col("comm"))
                    .alias("comm"),
                    (
                        ((F.col("u") + F.lit(r)) % 2 == 0)
                        & (F.col("c") != F.col("comm"))
                    ).cast("long").alias("__moved__"),
                )
            )
            prev = state
            new_state = best.localCheckpoint(eager=True)
            scratch.append(new_state)
            info["moves"].append(
                int(new_state.agg(F.sum("__moved__")).collect()[0][0] or 0)
            )
            state = new_state.select("u", "comm")
            release(prev)
        out = state.select(F.col("u").alias("vertex"), "comm").localCheckpoint(
            eager=True
        )
        info["n_communities"] = out.select("comm").distinct().count()
        return out, info
    finally:
        for df in scratch:
            release(df)


def contract_by_community(
    edges: DataFrame, comms: DataFrame, weight_col: str | None = None
) -> DataFrame:
    """The community graph that completes a Louvain level: every edge
    becomes (min(c_src, c_dst), max(c_src, c_dst)) with multiplicity
    summed into ``weight``; intra-community edges survive as self-loops
    (src = dst) carrying the internal-edge weight, which the next level's
    modularity arithmetic needs.  Two broadcast-or-shuffle joins keyed by
    vertex + one groupBy on the (coarse, tiny) community pair."""
    w0 = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    c = comms.select(F.col("vertex").alias("__v__"), F.col("comm").alias("__c__"))
    lab = (
        edges.join(c.withColumnRenamed("__v__", "src").withColumnRenamed("__c__", "cs"), "src")
        .join(c.withColumnRenamed("__v__", "dst").withColumnRenamed("__c__", "cd"), "dst")
        .select(
            F.least("cs", "cd").alias("src"),
            F.greatest("cs", "cd").alias("dst"),
            w0.alias("w"),
        )
    )
    return lab.groupBy("src", "dst").agg(F.sum("w").alias("weight"))


def louvain(
    edges: DataFrame,
    n_levels: int = 2,
    n_rounds: int = 3,
    weight_col: str | None = None,
) -> tuple[DataFrame, dict]:
    """Full multi-level Louvain: local-move phase -> contract -> repeat on
    the coarse weighted graph, ``n_levels`` times; the returned
    (vertex, comm) labels ORIGINAL vertices with their top-level
    community.  Level graphs shrink geometrically (each surviving
    community is one coarse vertex), so the level-2+ rounds run on tiny
    relations; the mapping composition is one |V|-row join per level."""
    if n_levels < 1:
        raise ValueError("n_levels must be >= 1")
    info: dict = {"n_levels": n_levels, "levels": []}
    scratch: list[DataFrame] = []
    g, wc, mapping = edges, weight_col, None
    try:
        for _ in range(n_levels):
            comms, li = louvain_local_move(g, n_rounds=n_rounds, weight_col=wc)
            scratch.append(comms)
            info["levels"].append(li)
            if mapping is None:
                mapping = comms
            else:
                mapping = (
                    mapping.select("vertex", F.col("comm").alias("__mid__"))
                    .join(
                        comms.select(
                            F.col("vertex").alias("__mid__"),
                            F.col("comm"),
                        ),
                        "__mid__",
                    )
                    .select("vertex", "comm")
                    .localCheckpoint(eager=True)
                )
                scratch.append(mapping)
            g = contract_by_community(g, comms, weight_col=wc).localCheckpoint(
                eager=True
            )
            scratch.append(g)
            wc = "weight"
        out = mapping.select("vertex", "comm").localCheckpoint(eager=True)
        info["n_communities"] = out.select("comm").distinct().count()
        return out, info
    finally:
        for df in scratch:
            release(df)
