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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from split_merge_partitioner_spark.storage import release

# Sub-threshold dense accelerator gate: when the weighted edge count (m2/2,
# an upper bound on edge ROWS since every weight >= 1) fits one scatter task,
# the whole parity-gated local-move loop runs as ONE Arrow job over the edge
# list — the pagerank/CC single-task-fusion contract.  All arithmetic is the
# identical exact-BIGINT formulation (scores, tie-breaks, parity gate), so
# the dense path is bit-equal to the distributed rounds; above the gate the
# distributed path runs unchanged.
DENSE_EDGE_THRESHOLD = 750_000


def _louvain_dense_compute(verts, k, n_rounds: int, m2: int, s, d, w):
    """The n_rounds synchronous local-move loop over the complete edge
    list, vectorized on the driver (the pagerank/CC driver-loop contract —
    the dense gate bounds the arrays at a few MB).  Exact-integer replica
    of the SQL rounds: candidate set = neighbor communities + stay row,
    score = 2m*w(u,C) - k_u*(tot(C) - [C = cu]*k_u), argmax with (score
    desc, community asc) tie-break, (u + r) % 2 parity gate.  Returns
    (comm dense indices, per-round move counts)."""
    n = len(verts)
    proper = s != d  # self-loops count in k (already in deg), never in w(u, C)
    si = np.searchsorted(verts, s[proper])
    di = np.searchsorted(verts, d[proper])
    pw = w[proper]
    comm = np.arange(n, dtype=np.int64)  # dense index == ascending id order
    arange_n = np.arange(n, dtype=np.int64)
    # static per-round inputs hoisted: the doubled (receiver, other) pairs
    recv = np.concatenate([si, di])
    oth = np.concatenate([di, si])
    wts_all = np.concatenate([pw, pw, np.zeros(n, dtype=np.int64)]).astype(np.float64)
    moves: list[int] = []
    for r in range(1, n_rounds + 1):
        # candidate multiset: (u, neighbor community, w) + stay rows w=0
        codes = np.concatenate([recv * n + comm[oth], arange_n * n + comm])
        uniq, inv = np.unique(codes, return_inverse=True)
        # bincount sums are exact here: every count is bounded by the
        # total weight m2/2 <= DENSE_EDGE_THRESHOLD << 2^53
        wsum = np.bincount(inv, weights=wts_all, minlength=len(uniq)).astype(np.int64)
        cand_u = uniq // n
        cand_c = uniq % n
        tot = np.bincount(comm, weights=k.astype(np.float64), minlength=n).astype(np.int64)
        stay = comm[cand_u] == cand_c
        score = m2 * wsum - k[cand_u] * (tot[cand_c] - np.where(stay, k[cand_u], 0))
        # segmented argmax with (score desc, community asc) tie-break:
        # candidates are sorted by (u, c) already (uniq is sorted and
        # code = u*n + c), so the FIRST index per u-group attaining the
        # group max is exactly the window/max_by winner
        starts = np.unique(cand_u, return_index=True)[1]
        gmax = np.maximum.reduceat(score, starts)
        counts = np.diff(np.append(starts, len(cand_u)))
        is_max = score == np.repeat(gmax, counts)
        idxs = np.where(is_max, np.arange(len(cand_u)), len(cand_u))
        win = np.minimum.reduceat(idxs, starts)
        best = comm.copy()
        best[cand_u[win]] = cand_c[win]
        # Spark's % is C-style remainder (sign of dividend) -> np.fmod
        gate = np.fmod(verts + r, 2) == 0
        moves.append(int((gate & (best != comm)).sum()))
        comm = np.where(gate, best, comm)
    return comm, moves


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
        # gate on m2 from ONE narrow aggregate (m2 = 2 * sum of all edge
        # weights, loops included: every proper edge contributes w to both
        # endpoints, every loop 2w — identical to summing the degree table):
        # the dense path then never pays the weighted-degree exchange at all
        m2 = 2 * int(e.agg(F.sum("w").alias("s")).collect()[0]["s"])
        if m2 // 2 <= DENSE_EDGE_THRESHOLD:
            # dense driver path: ONE parallel Arrow collect of the edge list
            # (toPandas — partition order, same concatenation the single-task
            # kernel saw; all sums are exact integers so order is moot
            # anyway), then degrees by bincount and the identical local-move
            # loop on the driver — bit-equal to the distributed rounds below
            # (same positivity/overflow guards, same errors), without the
            # coalesce(1) single-task scan, the degree groupBy exchange, or
            # the degree broadcast
            e_pdf = e.toPandas()
            s_arr = e_pdf["src"].to_numpy(np.int64)
            d_arr = e_pdf["dst"].to_numpy(np.int64)
            w_arr = e_pdf["w"].to_numpy(np.int64)
            if weight_col is not None and (w_arr <= 0).any():
                raise ValueError(
                    f"louvain_local_move: non-positive weights in {weight_col!r} "
                    "(integer multiplicities required)"
                )
            verts, inv = np.unique(np.concatenate([s_arr, d_arr]), return_inverse=True)
            # k(u) = sum of w over incident endpoint slots: a proper edge
            # contributes w at each endpoint, a loop appears in both the src
            # and dst slot of its vertex = 2w — exactly the SQL degree table
            wk = np.concatenate([w_arr, w_arr]).astype(np.float64)
            kvec = np.bincount(inv, weights=wk, minlength=len(verts)).astype(np.int64)
            kmax = int(kvec.max()) if len(kvec) else 0
            if m2 * kmax >= (1 << 62):
                raise ValueError(
                    "louvain_local_move: 2m * k_max >= 2^62 would overflow the "
                    "BIGINT score; re-express the score in DECIMAL(38,0) (see "
                    "module docstring) for graphs this large"
                )
            comm, moves = _louvain_dense_compute(
                verts, kvec, n_rounds, m2, s_arr, d_arr, w_arr
            )
            dense_info: dict = {
                "n_rounds": n_rounds,
                "moves": [int(x) for x in moves],
            }
            out = edges.sparkSession.createDataFrame(
                pd.DataFrame({"vertex": verts, "comm": verts[comm]})
            ).localCheckpoint(eager=True)
            dense_info["n_communities"] = int(len(np.unique(comm)))
            return out, dense_info
        if weight_col is not None and e.where(F.col("w") <= 0).limit(1).count():
            raise ValueError(
                f"louvain_local_move: non-positive weights in {weight_col!r} "
                "(integer multiplicities required)"
            )
        # persist (not localCheckpoint): the kmax aggregate below is the
        # materializing job — one setup job instead of two
        deg = (
            und.select("u", "w")
            .unionAll(loops.select(F.col("src").alias("u"), (F.col("w") * 2).alias("w")))
            .groupBy("u")
            .agg(F.sum("w").alias("k"))
        ).persist()
        scratch.append(deg)
        kmax = int(deg.agg(F.max("k").alias("kmax")).collect()[0]["kmax"])
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
            # argmax with the (score desc, c asc) tie-break as ONE partial-
            # aggregated max_by instead of a row_number window: the struct
            # ordering (score, -c) is maximal exactly at the window's first
            # row, ties impossible (c is unique per (u, comm) group), so the
            # winner is identical — but the sort + second exchange of the
            # window collapse into a hash aggregate (guide §2.4)
            best = (
                scored.groupBy("u", "comm")
                .agg(
                    F.max_by(
                        "c", F.struct(F.col("score"), (-F.col("c")).alias("nc"))
                    ).alias("c")
                )
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
            # lazy checkpoint materialized by the moves aggregate below:
            # one job per round instead of two (lineage still truncates)
            new_state = best.localCheckpoint(eager=False)
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
