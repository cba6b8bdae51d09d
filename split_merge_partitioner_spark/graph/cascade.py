"""Independent-cascade influence estimation — the spread primitive behind
influence maximization (Kempe, Kleinberg & Tardos, KDD 2003) and the
standard "how far does this propagate" question on a link/social graph.

IC model: each directed edge (u, v) independently "fires" with probability
p; the influence of a seed set S is the expected number of vertices
reachable from S through fired edges.  Estimated the standard way — by
Monte-Carlo over live-edge subgraphs — but with the engine's determinism
discipline: the coin for edge (u, v) in simulation s is

    splitmix64(src·1000003 + dst·40503 + s·2654435761 + seed) mod 1e6 < p_ppm

a pure function of (edge, sim, seed), so every simulation is bit-stable
under repartition/retry and the DuckDB oracle replays ALL simulations'
reachable sets exactly (no sampling variance between engines — the Doulion
/ random-walk discipline applied to cascades).

Execution — all simulations batched in ONE state relation (the
closeness.py batched-seed shape, with ``sim`` as the extra key):
- live edges = edges × sims filtered by the coin — materialized once,
  hash-partitioned by src; expected size = n_sims·p·m rows.
- BFS frontier keyed (sim, v); per round ONE co-located join + distinct +
  anti-join.  Round count = max live-path depth over sims, NOT n_sims·depth.
- Output: one row per simulation (sim, n_influenced) plus the seeds are
  always counted (reachable at distance 0).  The caller averages — kept
  per-sim so the oracle is exact-integer and the variance is visible.

Scale: state is at most n_sims·n slim rows; hubs cost one join row per
live out-edge.  n_sims is the accuracy dial (error ~ 1/√n_sims).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release
from .walks import _sm64

_MASK63 = (1 << 63) - 1
_P1 = 1_000_003
_P2 = 40_503
_PS = 2_654_435_761


def ic_influence(
    edges: DataFrame,
    seeds: list[int],
    p_ppm: int = 100_000,
    n_sims: int = 8,
    seed: int = 42,
    max_rounds: int = 64,
) -> DataFrame:
    """(sim, n_influenced): per-simulation reachable-set size of ``seeds``
    through the live-edge subgraph of the DIRECTED edge table under the
    independent-cascade model with edge probability ``p_ppm``/1e6."""
    if not seeds:
        raise ValueError("ic_influence needs a non-empty seed set")
    if not 0 <= p_ppm <= 1_000_000:
        raise ValueError("p_ppm must be in [0, 1e6]")
    if n_sims < 1:
        raise ValueError("n_sims must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    scratch: list = []
    try:
        sims = spark.range(0, n_sims).select(F.col("id").alias("sim"))
        coin = (
            _sm64(
                F.col("src") * _P1
                + F.col("dst") * _P2
                + F.col("sim") * _PS
                + F.lit(seed)
            ).bitwiseAND(F.lit(_MASK63))
            % 1_000_000
        )
        live = (
            edges.select("src", "dst")
            .crossJoin(sims)
            .where(coin < F.lit(p_ppm))
            .select("sim", F.col("src").alias("v"), F.col("dst").alias("nb"))
            .repartition(shuffle_n, "sim", "v")
            .localCheckpoint(eager=True)
        )
        scratch.append(live)
        seed_rows = [(int(v),) for v in sorted(set(seeds))]
        frontier = (
            spark.createDataFrame(seed_rows, "v long")
            .crossJoin(sims)
            .select("sim", "v")
            .localCheckpoint(eager=True)
        )
        scratch.append(frontier)
        visited = frontier
        for _ in range(max_rounds):
            nxt = (
                frontier.hint("shuffle_hash")
                .join(live, ["sim", "v"])
                .select("sim", F.col("nb").alias("v"))
                .distinct()
                .join(visited, ["sim", "v"], "left_anti")
                .localCheckpoint(eager=True)
            )
            scratch.append(nxt)
            if nxt.isEmpty():
                break
            visited = visited.unionAll(nxt).localCheckpoint(eager=True)
            scratch.append(visited)
            frontier = nxt
        else:
            raise RuntimeError(
                f"ic_influence did not exhaust frontiers in {max_rounds} rounds"
            )
        return (
            visited.groupBy("sim")
            .agg(F.count(F.lit(1)).cast("long").alias("n_influenced"))
            .localCheckpoint(eager=True)
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        for df in scratch:
            release(df)


def influence_max(
    edges: DataFrame,
    k: int,
    n_candidates: int = 16,
    p_ppm: int = 100_000,
    n_sims: int = 8,
    seed: int = 42,
    max_rounds: int = 64,
) -> DataFrame:
    """(rank, seed_vertex, marginal_gain, covered_pairs): greedy influence
    maximization (Kempe, Kleinberg & Tardos, KDD 2003) under the
    independent-cascade model — pick ``k`` seeds from the top-
    ``n_candidates`` out-degree pool, each round taking the candidate with
    the largest MARGINAL coverage of not-yet-covered (sim, vertex) pairs.

    Greedy on the Monte-Carlo live-edge estimate is the classic
    (1 − 1/e)-approximation; with the engine's deterministic per-(edge,
    sim) coins (module docstring) the live-edge subgraphs are pure
    functions of (edges, seed), so the WHOLE selection — reachable sets,
    marginal counts, tie-breaks (gain DESC, vertex ASC) — is bit-stable
    and exactly replayable by the SQL oracle.  marginal_gain counts newly
    covered (sim, vertex) pairs (divide by n_sims for the expected-spread
    estimate); covered_pairs is the running union's size.

    Execution: ALL candidates' cascades run in ONE batched BFS keyed
    (candidate, sim, vertex) — rounds = max live-path depth, not
    |candidates|·depth (the ic_influence shape with one more key).  The
    greedy loop then works entirely on the cover relation: per round one
    anti-join + one ≤n_candidates-row aggregate (a constant-size driver
    collect, the hits.py scalar pattern — never per-vertex data).  State
    is bounded by n_candidates·n_sims·n slim rows; the candidate pool is
    the scale dial and the top-degree heuristic is the standard one.

    Directed edges are deduped and self-loops dropped (both engines), so
    the out-degree candidate ranking is well-defined on a multiset input.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if n_candidates < k:
        raise ValueError("n_candidates must be >= k")
    if not 0 <= p_ppm <= 1_000_000:
        raise ValueError("p_ppm must be in [0, 1e6]")
    if n_sims < 1:
        raise ValueError("n_sims must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    scratch: list = []
    try:
        e = (
            edges.select("src", "dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        scratch.append(e)
        cand_rows = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
            .orderBy(F.desc("od"), F.asc("src"))
            .limit(n_candidates)
            .collect()
        )
        cands = [int(r.src) for r in cand_rows]
        if len(cands) < k:
            raise ValueError(
                f"only {len(cands)} candidates with out-edges, need k={k}"
            )
        sims = spark.range(0, n_sims).select(F.col("id").alias("sim"))
        coin = (
            _sm64(
                F.col("src") * _P1
                + F.col("dst") * _P2
                + F.col("sim") * _PS
                + F.lit(seed)
            ).bitwiseAND(F.lit(_MASK63))
            % 1_000_000
        )
        live = (
            e.crossJoin(sims)
            .where(coin < F.lit(p_ppm))
            .select("sim", F.col("src").alias("v"), F.col("dst").alias("nb"))
            .repartition(shuffle_n, "sim", "v")
            .localCheckpoint(eager=True)
        )
        scratch.append(live)
        frontier = (
            spark.createDataFrame([(c,) for c in cands], "cand long")
            .crossJoin(sims)
            .select("cand", "sim", F.col("cand").alias("v"))
            .localCheckpoint(eager=True)
        )
        scratch.append(frontier)
        visited = frontier
        for _ in range(max_rounds):
            nxt = (
                frontier.hint("shuffle_hash")
                .join(live, ["sim", "v"])
                .select("cand", "sim", F.col("nb").alias("v"))
                .distinct()
                .join(visited, ["cand", "sim", "v"], "left_anti")
                .localCheckpoint(eager=True)
            )
            scratch.append(nxt)
            if nxt.isEmpty():
                break
            visited = visited.unionAll(nxt).localCheckpoint(eager=True)
            scratch.append(visited)
            frontier = nxt
        else:
            raise RuntimeError(
                f"influence_max: cascades still expanding after {max_rounds} "
                "rounds — raise max_rounds"
            )
        cover = visited  # (cand, sim, v)

        covered = spark.createDataFrame([], "sim long, v long").localCheckpoint(
            eager=True
        )
        scratch.append(covered)
        chosen: list[int] = []
        out_rows: list[tuple] = []
        total = 0
        for r in range(1, k + 1):
            marg = (
                cover.where(~F.col("cand").isin(chosen) if chosen else F.lit(True))
                .join(covered, ["sim", "v"], "left_anti")
                .groupBy("cand")
                .agg(F.count(F.lit(1)).alias("g"))
                .collect()
            )
            gains = {int(m.cand): int(m.g) for m in marg}
            remaining = [c for c in cands if c not in chosen]
            best = min(remaining, key=lambda c: (-gains.get(c, 0), c))
            gain = gains.get(best, 0)
            chosen.append(best)
            total += gain
            out_rows.append((r, best, gain, total))
            covered = (
                covered.unionAll(
                    cover.where(F.col("cand") == best).select("sim", "v")
                )
                .distinct()
                .localCheckpoint(eager=True)
            )
            scratch.append(covered)
        return spark.createDataFrame(
            out_rows,
            "rank long, seed_vertex long, marginal_gain long, covered_pairs long",
        )
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        for df in scratch:
            release(df)
