"""Bond-percolation robustness profile — "how does the link graph fall
apart (or assemble) as edges are randomly dropped?"

Classic graph-robustness / percolation question (Callaway et al., PRL 2000;
the site/bond-percolation chapter of Newman's *Networks*): retain each edge
independently with probability p and measure the component structure —
giant-component size, component count, isolated-vertex count — as a curve
over p.  On a web-scale link graph this is the standard diagnostic for
crawl-failure tolerance and for locating the percolation threshold.

Determinism discipline (the ic_influence / random_walks recipe): the coin
for canonical edge (u, v) is

    splitmix64(u·1000003 + v·40503 + seed) & (2^63−1)  mod 1e6

a pure function of (edge, seed) — bit-stable under repartition/retry/
scale-out, and replayable in exact integers by the DuckDB oracle.  One coin
per edge (not per level) makes the survival sets NESTED:
coin < p₁ ⊆ coin < p₂ for p₁ ≤ p₂.

Execution — the nesting is the whole plan.  A naive profile runs one full
connected-components pass per level: k levels → k·O(m) shuffles.  Here the
levels ascend and each level only ADDS the edges in [p_prev, p_cur), so
after one star-contraction-free bootstrap (every vertex a singleton) each
level is a connected_components_incremental step on its delta slice:

- the m-edge relation is scanned ONCE (coin computed once, checkpointed);
  each edge lands in exactly one delta,
- per level the work is the component graph of the delta (≤|delta| edges,
  endpoints pre-mapped through the running labels with the big side never
  shuffled), so the total CC work across ALL levels ≈ one full CC run,
- per-level stats are one map-side-combined groupBy over the (vertex,
  component) labels — exact integers end to end.

At 100 TB: a 16-point robustness curve costs one pass over the edges plus
16 label-table scans with broadcast-joined deltas — not 16 CC jobs.

No counterpart in the reference (a partitioner, not an analytics engine);
cited contracts: components.py star/incremental labels (= component min).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..storage import release
from .components import connected_components_incremental
from .walks import _sm64

_MASK63 = (1 << 63) - 1
_P1 = 1_000_003
_P2 = 40_503


def bond_percolation_profile(
    edges: DataFrame,
    p_ppms: Sequence[int],
    seed: int = 42,
    max_rounds: int = 50,
) -> tuple[DataFrame, dict]:
    """((p_ppm, n_edges, n_components, giant_size, n_isolated), info):
    component structure of the bond-percolated graph at each retention
    level p_ppm/1e6 over the SAME deterministic coin assignment.

    n_edges = retained canonical edges, n_components counts every vertex of
    the ORIGINAL graph (an isolated vertex is its own component — the
    robustness convention), giant_size = largest component's vertex count,
    n_isolated = size-1 components.  info carries per-level incremental-CC
    round counts.  Levels are deduped and evaluated ascending; the output
    has one row per distinct level.
    """
    from ..sources.edges import vertices_of

    levels = sorted(set(int(p) for p in p_ppms))
    if not levels:
        raise ValueError("bond_percolation_profile needs >= 1 retention level")
    if levels[0] < 0 or levels[-1] > 1_000_000:
        raise ValueError("p_ppm levels must be in [0, 1e6]")
    spark = edges.sparkSession
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    scratch: list = []
    try:
        coin = (
            _sm64(F.col("src") * _P1 + F.col("dst") * _P2 + F.lit(seed))
            .bitwiseAND(F.lit(_MASK63))
            % 1_000_000
        )
        canon = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
            .select("src", "dst", coin.alias("coin"))
            .localCheckpoint(eager=True)
        )
        scratch.append(canon)
        universe = vertices_of(canon).localCheckpoint(eager=True)
        scratch.append(universe)
        # bootstrap: every vertex its own (min-label) singleton component
        labels = universe.select(
            "vertex", F.col("vertex").alias("component")
        ).localCheckpoint(eager=True)
        scratch.append(labels)

        rows: list[DataFrame] = []
        info: dict = {"levels": {}}
        prev = 0
        for p in levels:
            delta = canon.where(
                (F.col("coin") >= F.lit(prev)) & (F.col("coin") < F.lit(p))
            ).select("src", "dst")
            labels, step = connected_components_incremental(
                labels, delta, max_rounds=max_rounds
            )
            scratch.append(labels)
            stats = (
                labels.groupBy("component")
                .agg(F.count(F.lit(1)).alias("sz"))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_components"),
                    F.max("sz").cast("long").alias("giant_size"),
                    F.sum((F.col("sz") == 1).cast("long"))
                    .cast("long")
                    .alias("n_isolated"),
                )
            )
            ecnt = canon.where(F.col("coin") < F.lit(p)).agg(
                F.count(F.lit(1)).cast("long").alias("n_edges")
            )
            row = (
                ecnt.crossJoin(stats)
                .select(
                    F.lit(p).cast("long").alias("p_ppm"),
                    "n_edges",
                    "n_components",
                    "giant_size",
                    "n_isolated",
                )
                # lazy: all level rows materialize together in the single
                # final-union checkpoint job (labels stay alive until then)
                .localCheckpoint(eager=False)
            )
            scratch.append(row)
            rows.append(row)
            info["levels"][p] = {
                "rounds": step["rounds"],
                "merged_links": step["merged_links"],
            }
            prev = p

        out = rows[0]
        for r in rows[1:]:
            out = out.unionAll(r)
        out = out.localCheckpoint(eager=True)
        return out, info
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        for df in scratch:
            release(df)


def targeted_attack_profile(
    edges: DataFrame,
    remove_counts: Sequence[int],
    max_rounds: int = 50,
) -> tuple[DataFrame, dict]:
    """((n_removed, n_vertices, n_edges, n_components, giant_size,
    n_isolated), info): component structure after deleting the top-k
    highest-degree vertices (and every incident edge) for each k in
    ``remove_counts`` — the targeted-attack tolerance curve (Albert, Jeong
    & Barabási, *Nature* 2000), the hub-failure twin of
    bond_percolation_profile's random-failure curve.

    Removal order is the engine-independent total order (degree DESC,
    vertex ASC) over canonical-edge degrees, so every level is a pure
    function of the graph.  Stats cover the SURVIVING vertices only:
    n_vertices = n − k, n_components counts their components, n_isolated
    the size-1 ones.

    Execution — reverse nesting, same trick as the bond curve: edge e
    survives level k iff min over endpoints of the removal rank > k, so
    the survival sets GROW as k descends.  Levels are evaluated k-descending
    and each is an incremental-CC merge of the delta slice rank ∈ (k, k_prev]:
    one pass over the edges total, plus per level a ≤|delta|-edge component
    graph and one broadcast anti-join of the (tiny, ≤k_max-row) removed set
    for the stats.  The hub ranking itself is a distributed top-k
    (orderBy+limit = TakeOrdered, no global single-partition window); the
    row_number window runs on the ≤k_max-row result only.
    """
    from ..sources.edges import vertices_of

    ks = sorted(set(int(k) for k in remove_counts))
    if not ks:
        raise ValueError("targeted_attack_profile needs >= 1 removal level")
    if ks[0] < 0:
        raise ValueError("removal counts must be >= 0")
    kmax = ks[-1]
    spark = edges.sparkSession
    scratch: list = []
    try:
        canon = (
            edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .where(F.col("src") != F.col("dst"))
            .dropDuplicates(["src", "dst"])
            .localCheckpoint(eager=True)
        )
        scratch.append(canon)
        universe = vertices_of(canon).localCheckpoint(eager=True)
        scratch.append(universe)
        n = universe.count()
        if kmax >= n:
            raise ValueError(
                f"largest removal count {kmax} must be < n_vertices {n}"
            )
        degrees = (
            canon.select(F.col("src").alias("vertex"))
            .unionAll(canon.select(F.col("dst").alias("vertex")))
            .groupBy("vertex")
            .agg(F.count(F.lit(1)).alias("degree"))
        )
        hubs = degrees.orderBy(F.desc("degree"), F.asc("vertex")).limit(kmax)
        rk_w = Window.orderBy(F.desc("degree"), F.asc("vertex"))
        ranked = hubs.select(
            "vertex", F.row_number().over(rk_w).alias("rk")
        ).localCheckpoint(eager=True)
        scratch.append(ranked)
        sentinel = kmax + 1
        er = (
            canon.join(
                F.broadcast(
                    ranked.select(F.col("vertex").alias("src"), F.col("rk").alias("rs"))
                ),
                "src",
                "left",
            )
            .join(
                F.broadcast(
                    ranked.select(F.col("vertex").alias("dst"), F.col("rk").alias("rd"))
                ),
                "dst",
                "left",
            )
            .select(
                "src",
                "dst",
                F.least(
                    F.coalesce("rs", F.lit(sentinel)),
                    F.coalesce("rd", F.lit(sentinel)),
                ).alias("er"),
            )
            .localCheckpoint(eager=True)
        )
        scratch.append(er)
        labels = universe.select(
            "vertex", F.col("vertex").alias("component")
        ).localCheckpoint(eager=True)
        scratch.append(labels)

        rows: list[DataFrame] = []
        info: dict = {"n": n, "levels": {}}
        prev = None  # first level admits every edge with er > kmax
        for k in reversed(ks):
            cond = F.col("er") > F.lit(k)
            if prev is not None:
                cond = cond & (F.col("er") <= F.lit(prev))
            delta = er.where(cond).select("src", "dst")
            labels, step = connected_components_incremental(
                labels, delta, max_rounds=max_rounds
            )
            scratch.append(labels)
            removed = ranked.where(F.col("rk") <= F.lit(k)).select("vertex")
            alive = labels.join(F.broadcast(removed), "vertex", "left_anti")
            stats = (
                alive.groupBy("component")
                .agg(F.count(F.lit(1)).alias("sz"))
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_components"),
                    F.max("sz").cast("long").alias("giant_size"),
                    F.sum((F.col("sz") == 1).cast("long"))
                    .cast("long")
                    .alias("n_isolated"),
                )
            )
            ecnt = er.where(F.col("er") > F.lit(k)).agg(
                F.count(F.lit(1)).cast("long").alias("n_edges")
            )
            row = (
                ecnt.crossJoin(stats)
                .select(
                    F.lit(k).cast("long").alias("n_removed"),
                    F.lit(n - k).cast("long").alias("n_vertices"),
                    "n_edges",
                    "n_components",
                    "giant_size",
                    "n_isolated",
                )
                # lazy: all level rows materialize together in the single
                # final-union checkpoint job (labels stay alive until then)
                .localCheckpoint(eager=False)
            )
            scratch.append(row)
            rows.append(row)
            info["levels"][k] = {
                "rounds": step["rounds"],
                "merged_links": step["merged_links"],
            }
            prev = k

        out = rows[0]
        for r in rows[1:]:
            out = out.unionAll(r)
        out = out.localCheckpoint(eager=True)
        return out, info
    finally:
        for df in scratch:
            release(df)
