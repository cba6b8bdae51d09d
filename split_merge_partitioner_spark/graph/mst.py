"""Borůvka minimum spanning forest (Borůvka 1926; the textbook DISTRIBUTED
MST — O(log n) rounds, each fully data-parallel, the algorithm every
massively-parallel MST paper (Karloff et al. SODA'10 MapReduce model,
GraphX/Pregel implementations) builds on).

Semantics: edges are ordered by the TOTAL key (w, src, dst) — strict total
order even with duplicate weights — so the minimum spanning forest is
UNIQUE and cross-engine replayable (the DuckDB oracle replays the rounds
bit-for-bit; no tie luck).  Each round every component selects its minimum
incident inter-component edge under that key; selected edges join the
forest; components contract.

Contraction without a driver union-find: the per-component min-edge
pointers c -> n(c) form "conjoined trees" — chains of strictly DECREASING
edge keys (the min edge of n(c) is <= c's choice, equal only for the
mutual pair), so every pointer chain ends in exactly one 2-CYCLE {a, b}
with n(a) = b, n(b) = a.  POINTER DOUBLING (p <- p ∘ p, ceil(log2 chain)
steps) lands every component inside its 2-cycle, and the new component id
is min(p, n(p)) = min(a, b) — each doubling step is one self-join, so a
round costs O(log n) joins instead of O(chain) label-propagation hops (the
difference between 11 and 3500 sub-rounds on a path-shaped choice graph).

Scale shape (shuffle path): the component-level edge relation is re-argmin'd
per (component pair) each round, so it SHRINKS geometrically alongside the
component count; per-round relations are localCheckpointed (lineage-free)
and released (scc.py discipline).  Hub vertices never materialize a
neighbor list — everything is argmin-by-key.  Below ``dense_threshold``
edges the same rounds run vectorized on the driver (np.lexsort argmin +
vectorized doubling), the kcore/onion dual-path pattern; both paths produce
the identical unique forest (parity-tested).

No counterpart in the reference engine (a partitioner, not an algorithm
suite); companion to graph/components.py the way kruskal is to union-find.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..storage import release


def _msf_dense(spark, edges: DataFrame, max_rounds: int):
    pdf = edges.select("src", "dst", "w").toPandas()
    es = pdf["src"].to_numpy(np.int64)
    ed = pdf["dst"].to_numpy(np.int64)
    ew = pdf["w"].to_numpy(np.int64)
    verts = np.unique(np.concatenate([es, ed]))
    n = len(verts)
    s = np.searchsorted(verts, es)
    d = np.searchsorted(verts, ed)
    comp = np.arange(n, dtype=np.int64)  # dense comp ids = vertex index
    chosen: list[np.ndarray] = []
    rounds = 0
    while True:
        cs, cd = comp[s], comp[d]
        inter = cs != cd
        if not inter.any():
            break
        rounds += 1
        if rounds > max_rounds:
            raise RuntimeError(f"boruvka did not finish in {max_rounds} rounds")
        idx = np.nonzero(inter)[0]
        # directed candidates (c, edge idx), argmin per c by (w, src, dst)
        c = np.concatenate([cs[idx], cd[idx]])
        ii = np.concatenate([idx, idx])
        order = np.lexsort((ed[ii], es[ii], ew[ii], c))
        c_sorted = c[order]
        first = np.ones(len(order), bool)
        first[1:] = c_sorted[1:] != c_sorted[:-1]
        sel = order[first]  # one row per component, its argmin
        pc = c_sorted[first]  # the component
        pe = ii[sel]  # its chosen edge index
        chosen.append(np.unique(pe))
        # pointer n(c): the other endpoint's component
        ptr = np.full(n, -1, np.int64)
        other = np.where(cs[pe] == pc, cd[pe], cs[pe])
        ptr[pc] = other
        # pointer doubling into the 2-cycle, then label = min(p, n(p))
        p = ptr.copy()
        has = ptr >= 0
        k = max(1, int(np.ceil(np.log2(max(2, len(pc)))))) + 1
        for _ in range(k):
            p[has] = p[p[has]]
        newlab = comp.copy()
        active = np.nonzero(has)[0]
        newlab[active] = np.minimum(p[active], ptr[p[active]])
        comp = newlab[comp]
    if chosen:
        all_idx = np.unique(np.concatenate(chosen))
        rows = [
            (int(es[i]), int(ed[i]), int(ew[i])) for i in all_idx
        ]
    else:
        rows = []
    out = spark.createDataFrame(rows, "src long, dst long, w long") if rows else (
        spark.createDataFrame([], "src long, dst long, w long")
    )
    return out, {"rounds": rounds, "mode": "dense", "n_edges": len(rows)}


def _msf_shuffle(spark, edges: DataFrame, max_rounds: int):
    from ..sources.edges import vertices_of

    e = edges.select("src", "dst", "w").localCheckpoint(eager=True)
    lab = vertices_of(e).select(
        "vertex", F.col("vertex").alias("comp")
    ).localCheckpoint(eager=True)
    # component-level candidate relation, min edge per unordered comp pair —
    # shrinks geometrically with the component count
    ce = e.select(
        F.col("src").alias("a"), F.col("dst").alias("b"), "w", "src", "dst"
    ).localCheckpoint(eager=True)
    forests: list[DataFrame] = []
    rounds = 0
    try:
        while True:
            n_ce = ce.count()
            if n_ce == 0:
                break
            rounds += 1
            if rounds > max_rounds:
                raise RuntimeError(f"boruvka did not finish in {max_rounds} rounds")
            cand = ce.select(
                F.col("a").alias("c"), F.col("b").alias("oc"), "w", "src", "dst"
            ).unionAll(
                ce.select(
                    F.col("b").alias("c"), F.col("a").alias("oc"), "w", "src", "dst"
                )
            )
            wdw = Window.partitionBy("c").orderBy("w", "src", "dst")
            ptr = (
                cand.withColumn("rn", F.row_number().over(wdw))
                .where(F.col("rn") == 1)
                .drop("rn")
                .localCheckpoint(eager=True)
            )
            n_comp = ptr.count()
            forests.append(
                ptr.select("src", "dst", "w").distinct().localCheckpoint(eager=True)
            )
            # pointer doubling: k = ceil(log2 n_comp) + 1 self-joins
            p = ptr.select("c", F.col("oc").alias("p")).localCheckpoint(eager=True)
            k = max(1, int(np.ceil(np.log2(max(2, n_comp))))) + 1
            for _ in range(k):
                p2 = (
                    p.alias("x")
                    .join(p.select(F.col("c").alias("p"), F.col("p").alias("pp")), "p")
                    .select("c", F.col("pp").alias("p"))
                    .localCheckpoint(eager=True)
                )
                release(p)
                p = p2
            nl = (
                p.join(ptr.select(F.col("c").alias("p"), F.col("oc").alias("np")), "p")
                .select("c", F.least("p", "np").alias("nc"))
                .localCheckpoint(eager=True)
            )
            release(p)
            new_lab = (
                lab.join(nl.withColumnRenamed("c", "comp"), "comp", "left")
                .select("vertex", F.coalesce("nc", "comp").alias("comp"))
                .localCheckpoint(eager=True)
            )
            # contract the component-level relation and re-argmin per pair
            relab = (
                ce.join(nl.withColumnRenamed("c", "a"), "a", "left")
                .withColumn("na", F.coalesce("nc", "a"))
                .drop("nc")
                .join(
                    nl.select(F.col("c").alias("b"), F.col("nc").alias("ncb")),
                    "b",
                    "left",
                )
                .withColumn("nb", F.coalesce("ncb", "b"))
                .where(F.col("na") != F.col("nb"))
                .select(
                    F.least("na", "nb").alias("a"),
                    F.greatest("na", "nb").alias("b"),
                    "w",
                    "src",
                    "dst",
                )
            )
            wpair = Window.partitionBy("a", "b").orderBy("w", "src", "dst")
            new_ce = (
                relab.withColumn("rn", F.row_number().over(wpair))
                .where(F.col("rn") == 1)
                .drop("rn")
                .localCheckpoint(eager=True)
            )
            release(ce)
            release(lab)
            release(nl)
            release(ptr)
            ce = new_ce
            lab = new_lab
    finally:
        release(e)
        release(ce)
        release(lab)
    if not forests:
        out = spark.createDataFrame([], "src long, dst long, w long")
    else:
        out = forests[0]
        for df in forests[1:]:
            out = out.unionAll(df)
        # materialize and release the per-round pick checkpoints — a lazy
        # union would pin one block per Boruvka round on the caller
        # (components.connected_components_stars discipline)
        out = out.select("src", "dst", "w").localCheckpoint(eager=True)
        for df in forests:
            release(df)
    return out, {"rounds": rounds, "mode": "shuffle"}


def boruvka_msf(
    edges: DataFrame,
    weight_col: str = "w",
    max_rounds: int = 64,
    dense_threshold: int = 10_000_000,
) -> tuple[DataFrame, dict]:
    """((src, dst, w) minimum-spanning-forest DataFrame, info) for the
    undirected simple graph with BIGINT weights in ``weight_col``.

    The forest is the unique MSF under the strict total edge order
    (w, src, dst); duplicate weights are fine.  Self-loops must already be
    absent (they are in every ``sources/edges.py`` builder); parallel
    (src, dst) rows should be pre-deduped to the min weight.  Path choice
    by edge count as in kcore/onion: NumPy driver kernel below
    ``dense_threshold`` edges, the shuffle rounds above (parity-tested).
    """
    spark = edges.sparkSession
    e = edges.select(
        F.col("src").cast("long"),
        F.col("dst").cast("long"),
        F.col(weight_col).cast("long").alias("w"),
    )
    m = e.count()
    if m == 0:
        out = spark.createDataFrame([], "src long, dst long, w long")
        return out, {"rounds": 0, "mode": "empty", "n_edges": 0}
    if m <= dense_threshold:
        return _msf_dense(spark, e, max_rounds)
    return _msf_shuffle(spark, e, max_rounds)
