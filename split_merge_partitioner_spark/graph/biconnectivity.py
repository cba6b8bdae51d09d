"""Biconnected components and articulation points — Tarjan–Vishkin (1985)
expressed as Spark supersteps over the deterministic spanning forest.

The vertex twin of ``bridges.py``: bridges are the 2-EDGE-connectivity
cuts; articulation points are the 2-VERTEX-connectivity cuts, and the
biconnected components (BCCs) are the maximal subgraphs with no such cut.
The reference engine has neither (its analytics stop at replication
stats); this is a north-star graph-robustness operator in the class of
``bridges``/``two_edge_components``.

Algorithm (the PRAM classic, DFS-free — any rooted spanning tree works):

  1. spanning forest = ``boruvka_msf`` with w = 1 — the unique
     lexicographically-least forest, shared with bridges/MSF (so the whole
     pipeline is a pure function of the edge set: deterministic,
     retry/scale-out stable).
  2. root each tree at its minimum vertex: parent/depth by min-label
     propagation + BFS over tree edges (the bridges.py rooting).
  3. subtree sizes bottom-up by depth (one small aggregate per level).
  4. within-tree PREORDER numbers top-down by depth: pre(child) =
     pre(parent) + 1 + sum of sizes of smaller-id siblings (one window per
     level) — no Euler-tour list ranking needed; levels already exist.
     Ancestor test is then the interval check
     pre(u) <= pre(w) < pre(u) + size(u) (within one tree; every non-tree
     edge stays inside its tree's component, so cross-tree tests never
     arise).
  5. low/high(v) = min/max preorder reachable by one non-tree hop from
     subtree(v): per-vertex base from the non-tree incidence, then the
     same bottom-up sweep as 3.
  6. the auxiliary graph G'' on non-root vertices (vertex w stands for its
     parent tree edge (p(w), w)):
       R1: non-tree edge {v, w}, neither an ancestor of the other
           -> G'' edge {v, w};
       R2: tree edge (v = p(w), w) with v not a root -> G'' edge {v, w}
           iff low(w) < pre(v) or high(w) >= pre(v) + size(v)
           (subtree(w) escapes subtree(v), so the two tree edges lie on a
           common cycle).
     Connected components of G'' (star-contraction, O(log^2 n) rounds) are
     exactly the BCCs of G restricted to tree edges; a non-tree edge
     {v, w} joins the BCC of its later-preorder endpoint's tree edge.
  7. canonical labels: bcc = min over the component's edges of
     src * 2^31 + dst — independent of the tree, the rooting and the
     partitioning, so the dense and shuffle paths (and any reimplementation)
     agree bit-for-bit.

Costs at cluster scale: the forest is O(m) work over O(log n) Boruvka
rounds; phases 2-5 are one small shuffle per tree LEVEL (diameter-bounded,
like bridges/BFS — power-law graphs have O(log n) levels); phase 6 is a
star-contraction CC on a graph no larger than the input.  Nothing is
per-path, nothing collects O(n) to the driver on the shuffle path.

Dense path below ``dense_threshold`` edges runs the textbook iterative
Tarjan (Hopcroft-Tarjan low-link DFS with an edge stack) in NumPy/CPython
on the driver — the kcore/onion/bridges dual-path pattern; parity-tested
against the shuffle path, and both are pinned against an independent
remove-one-vertex reachability oracle in tests (and against DuckDB's
independent SQL computation in the driver contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..storage import release

_KEY = 1 << 31  # edge key = src * _KEY + dst  (ids must be < 2^31)


def biconnected_components(
    edges: DataFrame,
    max_rounds: int = 512,
    dense_threshold: int = 5_000_000,
) -> tuple[DataFrame, dict]:
    """((src, dst, bcc) DataFrame — one row per input edge, info).

    ``bcc`` = min(src * 2^31 + dst) over the edges of the biconnected
    component — the canonical label of the (graph-determined) partition of
    edges into BCCs.  Input: canonical undirected simple edges (src < dst,
    deduped, no self-loops — the ``sources/edges.py`` builders' contract).
    """
    spark = edges.sparkSession
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    m = e.count()
    if m == 0:
        out = spark.createDataFrame([], "src long, dst long, bcc long")
        return out, {"mode": "empty", "depth": 0, "n_bcc": 0}
    if m <= dense_threshold:
        return _bcc_dense(spark, e)
    return _bcc_shuffle(spark, e, max_rounds)


def articulation_points(
    edges: DataFrame,
    max_rounds: int = 512,
    dense_threshold: int = 5_000_000,
    labels: DataFrame | None = None,
) -> tuple[DataFrame, dict]:
    """((vertex, n_bcc, is_articulation) DataFrame, info).

    A vertex is an articulation point iff its incident edges span >= 2
    distinct biconnected components (covers the DFS root/non-root cases
    uniformly).  ``labels`` short-circuits recomputation when the caller
    already holds the ``biconnected_components`` output.
    """
    info: dict = {"mode": "labels"}
    if labels is None:
        labels, info = biconnected_components(edges, max_rounds, dense_threshold)
    out = (
        labels.select(F.col("src").alias("vertex"), "bcc")
        .unionAll(labels.select(F.col("dst").alias("vertex"), "bcc"))
        .groupBy("vertex")
        .agg(F.count_distinct("bcc").alias("n_bcc"))
        .select("vertex", "n_bcc", (F.col("n_bcc") >= 2).alias("is_articulation"))
    )
    return out, info


def block_cut_tree(
    edges: DataFrame,
    max_rounds: int = 512,
    dense_threshold: int = 5_000_000,
) -> tuple[DataFrame, dict]:
    """((vertex, bcc) DataFrame — the block-cut tree's incidence edges, info).

    The block-cut tree is the bipartite tree whose nodes are the blocks
    (biconnected components) and the cut (articulation) vertices, with an
    edge wherever a cut vertex belongs to a block; for a connected graph
    it is a tree: #incidences = #blocks + #cut_vertices − 1.  This is the
    graph's robustness skeleton — which blocks a cut vertex failure
    separates — in the summarization family of ``scc_condensation`` /
    ``wl_quotient``.
    """
    labels, info = biconnected_components(edges, max_rounds, dense_threshold)
    art, _ = articulation_points(edges, labels=labels)
    incid = (
        labels.select(F.col("src").alias("vertex"), "bcc")
        .unionAll(labels.select(F.col("dst").alias("vertex"), "bcc"))
        .distinct()
    )
    out = incid.join(
        art.where(F.col("is_articulation")).select("vertex"), "vertex"
    ).select("vertex", "bcc")
    return out, info


# ---------------------------------------------------------------------------
# dense path: textbook iterative Tarjan (edge-stack BCC) on driver arrays
# ---------------------------------------------------------------------------

def _bcc_dense(spark, e: DataFrame):
    pdf = e.toPandas()
    es = pdf["src"].to_numpy(np.int64)
    ed = pdf["dst"].to_numpy(np.int64)
    if len(es) and max(int(es.max()), int(ed.max())) >= _KEY:
        raise ValueError("biconnectivity: vertex ids must be < 2^31")
    verts = np.unique(np.concatenate([es, ed]))
    n = len(verts)
    s = np.searchsorted(verts, es)
    d = np.searchsorted(verts, ed)
    m = len(es)
    # undirected incidence CSR with edge ids
    a = np.concatenate([s, d])
    b = np.concatenate([d, s])
    eid = np.concatenate([np.arange(m), np.arange(m)])
    order = np.argsort(a, kind="stable")
    a, b, eid = a[order], b[order], eid[order]
    starts = np.searchsorted(a, np.arange(n + 1))

    disc = np.full(n, -1, np.int64)
    low = np.zeros(n, np.int64)
    par_edge = np.full(n, -1, np.int64)
    it_ptr = starts[:-1].copy()
    comp = np.full(m, -1, np.int64)
    estack: list[int] = []
    timer = 0
    n_bcc = 0
    for r in range(n):
        if disc[r] >= 0:
            continue
        disc[r] = low[r] = timer
        timer += 1
        stack = [r]
        while stack:
            v = stack[-1]
            if it_ptr[v] < starts[v + 1]:
                w = int(b[it_ptr[v]])
                ex = int(eid[it_ptr[v]])
                it_ptr[v] += 1
                if ex == par_edge[v]:
                    continue
                if disc[w] < 0:
                    par_edge[w] = ex
                    estack.append(ex)
                    disc[w] = low[w] = timer
                    timer += 1
                    stack.append(w)
                elif disc[w] < disc[v]:
                    # back edge (first sighting; the w-side re-visit skips)
                    estack.append(ex)
                    if disc[w] < low[v]:
                        low[v] = disc[w]
            else:
                stack.pop()
                if stack:
                    u = stack[-1]
                    if low[v] < low[u]:
                        low[u] = low[v]
                    if low[v] >= disc[u]:
                        # v's subtree + edge (u, v) close one BCC
                        while True:
                            x = estack.pop()
                            comp[x] = n_bcc
                            if x == par_edge[v]:
                                break
                        n_bcc += 1
    # canonical labels: min edge key per component
    keys = es * _KEY + ed
    lab = np.full(max(n_bcc, 1), np.iinfo(np.int64).max, np.int64)
    np.minimum.at(lab, comp, keys)
    # Arrow path via a pandas frame of the numpy arrays (the kcore dense-path
    # pattern) — a Python list of up-to-dense_threshold tuples would pay the
    # row-pickling driver cost the Arrow transfer exists to avoid
    out = spark.createDataFrame(
        pd.DataFrame(
            {
                "src": es.astype(np.int64),
                "dst": ed.astype(np.int64),
                "bcc": lab[comp].astype(np.int64),
            }
        )
    )
    return out, {"mode": "dense", "depth": 0, "n_bcc": int(n_bcc)}


# ---------------------------------------------------------------------------
# shuffle path: Tarjan-Vishkin over the rooted spanning forest
# ---------------------------------------------------------------------------

def _bcc_shuffle(spark, e: DataFrame, max_rounds: int):
    from ..sources.edges import vertices_of
    from .components import connected_components_stars
    from .mst import boruvka_msf

    scratch: list[DataFrame] = []

    def _ck(df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        scratch.append(out)
        return out

    try:
        if e.where((F.col("src") >= _KEY) | (F.col("dst") >= _KEY)).limit(1).count():
            raise ValueError("biconnectivity: vertex ids must be < 2^31")
        we = e.withColumn("w", F.lit(1).cast("long"))
        forest, _ = boruvka_msf(we, dense_threshold=0)
        scratch.append(forest)  # producer-materialized; dead once tree exists
        tree = _ck(forest.select("src", "dst"))
        nontree = _ck(e.join(tree, ["src", "dst"], "left_anti"))
        tb = _ck(
            tree.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
                tree.select(F.col("dst").alias("a"), F.col("src").alias("b"))
            )
        )
        # ---- rooting (bridges.py pattern): min-label roots, BFS levels ----
        lab = _ck(vertices_of(e).select("vertex", F.col("vertex").alias("lab")))
        for _ in range(max_rounds):
            nxt = (
                tb.join(lab.withColumnRenamed("vertex", "b"), "b")
                .groupBy(F.col("a").alias("vertex"))
                .agg(F.min("lab").alias("nl"))
            )
            new_lab = _ck(
                lab.join(nxt, "vertex", "left").select(
                    "vertex", F.least("lab", F.coalesce("nl", "lab")).alias("lab")
                )
            )
            changed = (
                new_lab.select("vertex", F.col("lab").alias("lab_new"))
                .join(lab.select("vertex", F.col("lab").alias("lab_old")), "vertex")
                .where(F.col("lab_new") != F.col("lab_old"))
                .count()
            )
            lab = new_lab
            if changed == 0:
                break
        else:
            raise RuntimeError("biconnectivity: min-label did not converge")
        st = _ck(
            lab.select(
                "vertex",
                F.when(F.col("vertex") == F.col("lab"), 0)
                .otherwise(-1)
                .cast("long")
                .alias("depth"),
                F.lit(None).cast("long").alias("parent"),
            )
        )
        dmax = 0
        while True:
            frontier = st.where(F.col("depth") == dmax).select(F.col("vertex").alias("a"))
            nxt = (
                tb.join(frontier, "a")
                .select(F.col("b").alias("vertex"), F.col("a").alias("np_"))
                .join(st.where(F.col("depth") >= 0).select("vertex"), "vertex", "left_anti")
            )
            if nxt.isEmpty():
                break
            dmax += 1
            if dmax > max_rounds:
                raise RuntimeError("biconnectivity: BFS exceeded max_rounds")
            st = _ck(
                st.join(nxt, "vertex", "left").select(
                    "vertex",
                    F.when(F.col("np_").isNotNull(), F.lit(dmax))
                    .otherwise(F.col("depth"))
                    .cast("long")
                    .alias("depth"),
                    F.coalesce("parent", "np_").alias("parent"),
                )
            )
        # ---- subtree sizes bottom-up ----
        sz = _ck(st.select("vertex", "depth", "parent", F.lit(1).cast("long").alias("size")))
        for dd in range(dmax, 0, -1):
            up = (
                sz.where(F.col("depth") == dd)
                .groupBy(F.col("parent").alias("vertex"))
                .agg(F.sum("size").alias("add"))
            )
            sz = _ck(
                sz.join(up, "vertex", "left").select(
                    "vertex", "depth", "parent",
                    (F.col("size") + F.coalesce("add", F.lit(0))).alias("size"),
                )
            )
        # ---- within-tree preorder top-down ----
        pre = _ck(
            sz.where(F.col("depth") == 0).select("vertex", F.lit(0).cast("long").alias("pre"))
        )
        w_sib = (
            Window.partitionBy("parent")
            .orderBy("vertex")
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        for dd in range(1, dmax + 1):
            level = (
                sz.where(F.col("depth") == dd)
                .select(
                    "vertex", "parent",
                    F.coalesce(F.sum("size").over(w_sib), F.lit(0)).alias("off"),
                )
            )
            child_pre = level.join(
                pre.select(F.col("vertex").alias("parent"), F.col("pre").alias("ppre")),
                "parent",
            ).select("vertex", (F.col("ppre") + 1 + F.col("off")).alias("pre"))
            pre = _ck(pre.unionAll(child_pre))
        node = _ck(
            sz.join(pre, "vertex").select("vertex", "depth", "parent", "size", "pre")
        )
        # ---- low/high: non-tree base + bottom-up min/max ----
        ntb = nontree.select(F.col("src").alias("v"), F.col("dst").alias("u")).unionAll(
            nontree.select(F.col("dst").alias("v"), F.col("src").alias("u"))
        )
        base = (
            ntb.join(node.select(F.col("vertex").alias("u"), F.col("pre").alias("upre")), "u")
            .groupBy(F.col("v").alias("vertex"))
            .agg(F.min("upre").alias("nlo"), F.max("upre").alias("nhi"))
        )
        lh = _ck(
            node.join(base, "vertex", "left").select(
                "vertex", "depth", "parent", "size", "pre",
                F.least("pre", F.coalesce("nlo", "pre")).alias("low"),
                F.greatest("pre", F.coalesce("nhi", "pre")).alias("high"),
            )
        )
        for dd in range(dmax, 0, -1):
            up = (
                lh.where(F.col("depth") == dd)
                .groupBy(F.col("parent").alias("vertex"))
                .agg(F.min("low").alias("clo"), F.max("high").alias("chi"))
            )
            lh = _ck(
                lh.join(up, "vertex", "left").select(
                    "vertex", "depth", "parent", "size", "pre",
                    F.least("low", F.coalesce("clo", "low")).alias("low"),
                    F.greatest("high", F.coalesce("chi", "high")).alias("high"),
                )
            )
        # ---- G'' edges ----
        nv = lh.select("vertex", "pre", "size", "low", "high", "depth", "parent")
        # R1: non-tree {v, w}, neither endpoint an ancestor of the other
        nt = (
            nontree.join(
                nv.select(
                    F.col("vertex").alias("src"),
                    F.col("pre").alias("pv"), F.col("size").alias("sv"),
                ),
                "src",
            )
            .join(
                nv.select(
                    F.col("vertex").alias("dst"),
                    F.col("pre").alias("pw"), F.col("size").alias("sw"),
                ),
                "dst",
            )
        )
        unrelated = ~(
            ((F.col("pv") <= F.col("pw")) & (F.col("pw") < F.col("pv") + F.col("sv")))
            | ((F.col("pw") <= F.col("pv")) & (F.col("pv") < F.col("pw") + F.col("sw")))
        )
        g2_r1 = nt.where(unrelated).select(
            F.col("src").alias("x"), F.col("dst").alias("y")
        )
        # R2: tree edge (v = parent(w), w), v not a root
        chl = nv.where(F.col("parent").isNotNull()).select(
            F.col("vertex").alias("x"),
            F.col("parent").alias("y"),
            F.col("low").alias("wlo"), F.col("high").alias("whi"),
        )
        g2_r2 = (
            chl.join(
                nv.where(F.col("parent").isNotNull()).select(
                    F.col("vertex").alias("y"),
                    F.col("pre").alias("pv"), F.col("size").alias("sv"),
                ),
                "y",
            )
            .where(
                (F.col("wlo") < F.col("pv"))
                | (F.col("whi") >= F.col("pv") + F.col("sv"))
            )
            .select("x", "y")
        )
        g2 = _ck(
            g2_r1.unionAll(g2_r2)
            .select(F.least("x", "y").alias("src"), F.greatest("x", "y").alias("dst"))
            .distinct()
        )
        comps, _ = connected_components_stars(g2, max_rounds=max_rounds)
        scratch.append(comps)  # producer-materialized; dead once cc exists
        # every non-root vertex is a G'' vertex; isolated ones (their parent
        # tree edge is its own BCC) label themselves
        cc = _ck(
            nv.where(F.col("parent").isNotNull())
            .select("vertex")
            .join(comps, "vertex", "left")
            .select("vertex", F.coalesce("component", "vertex").alias("comp"))
        )
        # ---- per-edge raw labels ----
        tree_lab = (
            tree.join(
                nv.select(
                    F.col("vertex").alias("src"),
                    F.col("depth").alias("ds"),
                ),
                "src",
            )
            .join(
                nv.select(F.col("vertex").alias("dst"), F.col("depth").alias("dd")),
                "dst",
            )
            .select(
                "src", "dst",
                F.when(F.col("ds") > F.col("dd"), F.col("src"))
                .otherwise(F.col("dst"))
                .alias("vertex"),  # child endpoint = deeper one
            )
            .join(cc, "vertex")
            .select("src", "dst", "comp")
        )
        nontree_lab = (
            nt.select(
                "src", "dst",
                F.when(F.col("pw") > F.col("pv"), F.col("dst"))
                .otherwise(F.col("src"))
                .alias("vertex"),  # later-preorder endpoint
            )
            .join(cc, "vertex")
            .select("src", "dst", "comp")
        )
        raw = _ck(tree_lab.unionAll(nontree_lab))
        # ---- canonical relabel: min edge key per component ----
        keys = raw.select(
            "comp", (F.col("src") * F.lit(_KEY) + F.col("dst")).alias("k")
        )
        canon = keys.groupBy("comp").agg(F.min("k").alias("bcc"))
        out = (
            raw.join(canon, "comp")
            .select("src", "dst", "bcc")
            .localCheckpoint(eager=True)
        )
        n_bcc = out.select("bcc").distinct().count()
        return out, {"mode": "shuffle", "depth": dmax, "n_bcc": n_bcc}
    finally:
        for df in scratch:
            release(df)
