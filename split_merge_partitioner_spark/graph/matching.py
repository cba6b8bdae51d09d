"""Maximal matching — the edge-side Luby primitive (Israeli-Itai 1986
style, derandomized with keyed hash priorities).

Round r: every surviving edge draws priority p_r(e) = Lehmer(src·1000003
+ dst, seed+r) — a pure function of (edge, round), so the run is
partitioning-independent and SQL-replayable.  An edge joins the matching
iff its (priority, src, dst) triple is the strict minimum among ALL
surviving edges incident to either of its endpoints (local-minimum on
the line graph; the id tie-break makes winners unique).  Matched
endpoints leave the graph; the global minimum edge always wins, so the
loop terminates, and O(log m) rounds suffice in expectation.

Per round: one explode of each edge to its two endpoints, one
groupBy(vertex)-min, two joins to test the both-endpoints-minimum
condition, two semi-join removals — all Catalyst, no Python.

Why it's here: maximal matching is THE coarsening primitive of multilevel
partitioners (METIS's heavy-edge matching is this loop plus a weight
bias) and a standard symmetry-breaking tool; it complements the MIS
(vertex) primitive in graph/mis.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release

from ..functions.sampling import sample_hash


WEIGHT_CAP = 2_097_151  # 2^21 - 1: keeps the oracle's HUGEINT key encoding exact


def maximal_matching(
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int | None = None,
    weight_col: str | None = None,
    quantize: bool = False,
) -> tuple[DataFrame, dict]:
    """((src, dst, round_matched), info): the matched edges of a maximal
    matching over the undirected canonical edge table; ``round_matched``
    is 1-based.  Guarantees: no two matched edges share an endpoint; every
    unmatched input edge has a matched endpoint (maximality).

    With ``weight_col`` (positive integer weights < 2^21) the priority
    becomes (−weight, hash, src, dst): heavier edges win their
    neighborhoods first — METIS's heavy-edge matching rule, the quality
    heuristic for multilevel coarsening (contracting heavy edges keeps cut
    weight in the coarse graph).

    Weighted worst case: exact-weight dominance means the hash reseed only
    breaks ties among EQUAL weights, so an adversarial ordering (e.g. a
    path with strictly monotone weights) resolves ~1 edge per round — the
    O(log m) Luby expectation does NOT apply.  ``max_rounds`` therefore
    defaults to 64 unweighted but 512 weighted (fail-fast, never wrong).
    ``quantize=True`` restores O(log m)-ish behavior on such inputs by
    using the weight's power-of-two class floor(log2(w)) as the primary
    key — the hash then randomizes within each class (≤21 classes), at a
    mild heavy-edge-quality cost; still a pure function of (edge, round),
    so runs stay partitioning-independent and SQL-replayable."""
    if max_rounds is None:
        max_rounds = 512 if weight_col is not None else 64
    cols = [
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    ]
    if weight_col is not None:
        cols.append(F.col(weight_col).cast("long").alias("__w__"))
    e = (
        edges.select(*cols)
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    if weight_col is not None:
        bad = e.where((F.col("__w__") <= 0) | (F.col("__w__") >= WEIGHT_CAP)).count()
        if bad:
            raise ValueError(
                f"{bad} edges have weights outside (0, {WEIGHT_CAP}) — rescale first"
            )
    matched: DataFrame | None = None
    info = {"rounds": 0, "converged": False}
    for r in range(1, max_rounds + 1):
        if e.isEmpty():
            info["converged"] = True
            break
        info["rounds"] = r
        pr = e.withColumn(
            "__ekey__",
            F.col("src").cast("long") * F.lit(1000003) + F.col("dst").cast("long"),
        ).withColumn("p", sample_hash("__ekey__", seed + r))
        if weight_col is not None:
            if quantize:
                # power-of-two weight class: heavier classes still dominate,
                # the hash randomizes within a class => O(log m) expectation
                # holds per class; the class is bit_length(w)-1 = exact
                # floor(log2 w) with NO float (libm log2 can land on k-ε at
                # powers of two), so the DuckDB replay stays bit-identical
                pr = pr.withColumn(
                    "wneg",
                    F.lit(21) - (F.length(F.bin(F.col("__w__"))) - 1).cast("long"),
                )
            else:
                pr = pr.withColumn("wneg", F.lit(WEIGHT_CAP) - F.col("__w__"))
            key_cols = ["wneg", "p", "src", "dst"]
        else:
            key_cols = ["p", "src", "dst"]
        pr = pr.select("src", "dst", *[c for c in key_cols if c not in ("src", "dst")])
        inc = pr.select(F.col("src").alias("v"), *key_cols).unionAll(
            pr.select(F.col("dst").alias("v"), *key_cols)
        )
        vmin = inc.groupBy("v").agg(F.min(F.struct(*key_cols)).alias("m"))
        key = F.struct(*key_cols)
        winners = (
            pr.join(vmin.select(F.col("v").alias("src"), F.col("m").alias("ms")), "src")
            .join(vmin.select(F.col("v").alias("dst"), F.col("m").alias("md")), "dst")
            .where((key == F.col("ms")) & (key == F.col("md")))
            .select("src", "dst")
            .localCheckpoint(eager=True)
        )
        sel = winners.select("src", "dst", F.lit(r).cast("long").alias("round_matched"))
        prev_matched = matched
        matched = (sel if matched is None else matched.unionAll(sel)).localCheckpoint(
            eager=True
        )
        if prev_matched is not None:
            release(prev_matched)  # consumed: the new checkpoint owns the rows
        gone = (
            winners.select(F.col("src").alias("v"))
            .unionAll(winners.select(F.col("dst").alias("v")))
            .distinct()
        )
        prev_e = e
        e = (
            e.join(gone.withColumnRenamed("v", "src"), "src", "left_anti")
            .join(gone.withColumnRenamed("v", "dst"), "dst", "left_anti")
            .localCheckpoint(eager=True)
        )
        release(prev_e)
        release(winners)
        if e.isEmpty():  # resolving on the final allowed round is success
            info["converged"] = True
            break
    else:
        raise RuntimeError(f"matching did not resolve in {max_rounds} rounds")
    release(e)  # the drained edge relation; `matched` stays (it IS the result)
    if matched is None:
        spark = edges.sparkSession
        return spark.createDataFrame([], "src long, dst long, round_matched long"), info
    return matched, info


def coarsen_graph(
    edges: DataFrame,
    weight_col: str = "shared",
    seed: int = 42,
) -> tuple[DataFrame, DataFrame, dict]:
    """One multilevel coarsening step (the METIS inner loop): heavy-edge
    maximal matching, then contraction of each matched pair into a
    supervertex named by its smaller id.

    Returns (coarse_edges, mapping, info): ``coarse_edges`` is the
    contracted weighted graph (src, dst, weight) with parallel edges
    merged by weight SUM and intra-pair edges dropped; ``mapping`` is
    (vertex, rep) for every input vertex (unmatched vertices map to
    themselves).  Iterating this halves-ish the graph per level while the
    heavy-edge rule keeps cut weight representable in the coarse graph —
    the standard multilevel prelude to any partitioner refinement.

    Cost on top of the matching: one broadcast-eligible mapping join per
    endpoint + one groupBy(coarse pair) SUM — two exchanges.
    """
    m, info = maximal_matching(edges, seed=seed, weight_col=weight_col)
    pairs = m.select(
        F.least("src", "dst").alias("rep"), F.col("src"), F.col("dst")
    )
    vmap = pairs.select(F.col("src").alias("v"), "rep").unionAll(
        pairs.select(F.col("dst").alias("v"), "rep")
    )
    universe = (
        edges.select(F.col("src").alias("v"))
        .unionAll(edges.select(F.col("dst").alias("v")))
        .distinct()
    )
    mapping = universe.join(vmap, "v", "left").select(
        F.col("v").alias("vertex"), F.coalesce("rep", F.col("v")).alias("rep")
    )
    ms = mapping.select(F.col("vertex").alias("src"), F.col("rep").alias("rs"))
    md = mapping.select(F.col("vertex").alias("dst"), F.col("rep").alias("rd"))
    coarse = (
        edges.join(ms, "src")
        .join(md, "dst")
        .where(F.col("rs") != F.col("rd"))
        .select(
            F.least("rs", "rd").alias("src"),
            F.greatest("rs", "rd").alias("dst"),
            F.col(weight_col).alias("w"),
        )
        .groupBy("src", "dst")
        .agg(F.sum("w").cast("long").alias("weight"))
    )
    return coarse, mapping, info
