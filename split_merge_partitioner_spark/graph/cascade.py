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
