"""Vertex ordering for graph storage locality: Cuthill-McKee bandwidth
reduction + WebGraph-style adjacency gap accounting.

At 100 TB the dominant cost of a link graph is the adjacency storage and
the cache behavior of scans over it; production web-graph stacks
(WebGraph/BV, Boldi-Vigna WWW'04) spend their compression budget on vertex
ORDER, because delta-encoded neighbor lists cost ~log2(gap) bits per edge
and a locality-preserving order shrinks the gaps.  This module provides

  * ``cuthill_mckee_order`` — the classic bandwidth-reduction order
    (Cuthill & McKee 1969, reversed by default per George 1971): BFS from a
    minimum-degree start, each level ordered by (parent position, degree,
    id).  Deterministic variant: the start vertex is the (degree, id)-min
    per component (the pseudo-peripheral start heuristic is documented out
    of scope — any start yields a valid CM order; this one is a pure
    function of the graph).
  * ``adjacency_gap_bits`` — the exact-integer accounting that makes an
    order's value measurable: per vertex, neighbors sorted by position,
    cost = bits(|first - self|) + sum bits(successive deltas), where
    bits(g) = length of the binary representation = floor(log2 g) + 1
    (both engines: LENGTH(BIN(g)) — no libm, no floats).

Execution shape (shuffle path): one small exchange per BFS LEVEL — the
bridges/biconnectivity cost shape (diameter-bounded; power-law graphs have
O(log n) levels).  Each level assigns positions with ONE window
(rank by (min parent position, degree, id) partitioned by component) plus
a broadcast-size per-component offset relation.  Gap accounting is a
join + one window over the doubled adjacency — embarrassingly parallel.
Dense path below ``dense_threshold`` runs the identical rules in
NumPy/CPython (parity-tested).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..storage import release


def cuthill_mckee_order(
    edges: DataFrame,
    reverse: bool = True,
    max_rounds: int = 512,
    dense_threshold: int = 5_000_000,
) -> tuple[DataFrame, dict]:
    """((vertex, pos) DataFrame — a permutation of the graph's vertices, info).

    Components are laid out consecutively in min-vertex order; inside a
    component, positions follow Cuthill-McKee (reversed iff ``reverse``).
    Input: canonical undirected simple edges (src < dst, deduped).
    """
    spark = edges.sparkSession
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    m = e.count()
    if m == 0:
        out = spark.createDataFrame([], "vertex long, pos long")
        return out, {"mode": "empty", "depth": 0, "n": 0}
    if m <= dense_threshold:
        return _cm_dense(spark, e, reverse)
    return _cm_shuffle(spark, e, reverse, max_rounds)


def adjacency_gap_bits(edges: DataFrame, order: DataFrame) -> DataFrame:
    """One-row DataFrame (total_bits, n_dirs): exact delta-encoding cost of
    the doubled adjacency under ``order`` ((vertex, pos) permutation).

    Per source vertex, neighbor positions ascending: the first neighbor
    costs bits(|pos_nb - pos_v|) (>= 1; equal positions cannot occur in a
    permutation of a simple graph), each later one bits(delta to its
    predecessor).  ``bits(g) = LENGTH(BIN(g))`` — integer-exact in both
    engines.  ``n_dirs`` = 2m rows accounted (sanity anchor).
    """
    und = edges.select(F.col("src").alias("v"), F.col("dst").alias("nb")).unionAll(
        edges.select(F.col("dst").alias("v"), F.col("src").alias("nb"))
    )
    pos_v = order.select(F.col("vertex").alias("v"), F.col("pos").alias("pv"))
    pos_n = order.select(F.col("vertex").alias("nb"), F.col("pos").alias("pn"))
    w = Window.partitionBy("v").orderBy("pn")
    g = (
        und.join(pos_v, "v")
        .join(pos_n, "nb")
        .select("v", "pv", "pn", F.lag("pn").over(w).alias("prev"))
        .select(
            F.when(
                F.col("prev").isNull(), F.abs(F.col("pn") - F.col("pv"))
            )
            .otherwise(F.col("pn") - F.col("prev"))
            .alias("gap")
        )
    )
    return g.agg(
        F.sum(F.length(F.bin(F.col("gap")))).alias("total_bits"),
        F.count(F.lit(1)).alias("n_dirs"),
    )


def _natural_order(edges: DataFrame) -> DataFrame:
    """(vertex, pos) by ascending vertex id — the do-nothing baseline."""
    from ..sources.edges import vertices_of

    w = Window.orderBy("vertex")
    return vertices_of(edges).select(
        "vertex", (F.row_number().over(w) - 1).cast("long").alias("pos")
    )


def _degree_desc_order(edges: DataFrame) -> DataFrame:
    """(vertex, pos) by (degree DESC, vertex) — the hub-first baseline."""
    from ..sources.edges import degrees

    w = Window.orderBy(F.col("degree").desc(), "vertex")
    return degrees(edges).select(
        "vertex", (F.row_number().over(w) - 1).cast("long").alias("pos")
    )


def order_compression_report(edges: DataFrame, **cm_kwargs) -> DataFrame:
    """(order_name, total_bits, n_dirs) for natural / degree-desc / RCM —
    the measurable 'vertex order is a compression dial' table."""
    rcm, _ = cuthill_mckee_order(edges, **cm_kwargs)
    rows = []
    for name, order in (
        ("natural", _natural_order(edges)),
        ("degree_desc", _degree_desc_order(edges)),
        ("rcm", rcm),
    ):
        rows.append(
            adjacency_gap_bits(edges, order).select(
                F.lit(name).alias("order_name"), "total_bits", "n_dirs"
            )
        )
    out = rows[0].unionAll(rows[1]).unionAll(rows[2])
    return out


# ---------------------------------------------------------------------------
# dense path
# ---------------------------------------------------------------------------

def _cm_dense(spark, e: DataFrame, reverse: bool):
    pdf = e.toPandas()
    es = pdf["src"].to_numpy(np.int64)
    ed = pdf["dst"].to_numpy(np.int64)
    verts = np.unique(np.concatenate([es, ed]))
    n = len(verts)
    s = np.searchsorted(verts, es)
    d = np.searchsorted(verts, ed)
    a = np.concatenate([s, d])
    b = np.concatenate([d, s])
    order_ = np.argsort(a, kind="stable")
    a, b = a[order_], b[order_]
    starts = np.searchsorted(a, np.arange(n + 1))
    deg = starts[1:] - starts[:-1]

    pos = np.full(n, -1, np.int64)
    nxt = 0
    depth = 0
    # components in min-vertex order == ascending unseen scan order
    for r in range(n):
        if pos[r] >= 0:
            continue
        # component start = (degree, id)-min of r's component: find via BFS
        comp = [r]
        seen = {r}
        qi = 0
        while qi < len(comp):
            v = comp[qi]
            qi += 1
            for u in b[starts[v]: starts[v + 1]]:
                if int(u) not in seen:
                    seen.add(int(u))
                    comp.append(int(u))
        start = min(comp, key=lambda v: (deg[v], v))
        # CM BFS from start
        pos[start] = nxt
        nxt += 1
        frontier = [start]
        lvl = 0
        while frontier:
            cand: dict[int, int] = {}
            for v in frontier:
                for u in b[starts[v]: starts[v + 1]]:
                    u = int(u)
                    if pos[u] < 0:
                        pv = pos[v]
                        if u not in cand or pv < cand[u]:
                            cand[u] = pv
            nxt_frontier = sorted(cand, key=lambda u: (cand[u], deg[u], u))
            for u in nxt_frontier:
                pos[u] = nxt
                nxt += 1
            frontier = nxt_frontier
            if nxt_frontier:
                lvl += 1
        depth = max(depth, lvl)
    if reverse:
        # reverse WITHIN the global sequence (component blocks flip in
        # place is the textbook RCM for connected graphs; for forests we
        # reverse per component to keep blocks consecutive)
        # recompute per-component block reversal:
        comp_of = np.full(n, -1, np.int64)
        for r in range(n):
            if comp_of[r] >= 0:
                continue
            stack = [r]
            comp_of[r] = r
            while stack:
                v = stack.pop()
                for u in b[starts[v]: starts[v + 1]]:
                    if comp_of[u] < 0:
                        comp_of[u] = r
                        stack.append(int(u))
        for root in np.unique(comp_of):
            idx = np.nonzero(comp_of == root)[0]
            p = pos[idx]
            pos[idx] = p.min() + p.max() - p
    # Arrow path via a pandas frame of the numpy arrays (the kcore dense-path
    # pattern) — never a Python list of up-to-dense_threshold tuples
    out = spark.createDataFrame(
        pd.DataFrame({"vertex": verts.astype(np.int64), "pos": pos.astype(np.int64)})
    )
    return out, {"mode": "dense", "depth": int(depth), "n": n}


# ---------------------------------------------------------------------------
# shuffle path
# ---------------------------------------------------------------------------

def _cm_shuffle(spark, e: DataFrame, reverse: bool, max_rounds: int):
    from ..sources.edges import degrees
    from .components import connected_components_stars

    scratch: list[DataFrame] = []

    def _ck(df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        scratch.append(out)
        return out

    try:
        und = _ck(
            e.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
                e.select(F.col("dst").alias("a"), F.col("src").alias("b"))
            )
        )
        deg = _ck(degrees(e))  # (vertex, degree)
        comps, _ = connected_components_stars(e, max_rounds=max_rounds)
        cv = _ck(comps.select("vertex", F.col("component").alias("comp")))
        # per-component start = (degree, id)-min
        w_start = Window.partitionBy("comp").orderBy("degree", "vertex")
        start = (
            cv.join(deg, "vertex")
            .select("comp", "vertex", "degree", F.row_number().over(w_start).alias("rn"))
            .where(F.col("rn") == 1)
            .select("comp", "vertex")
        )
        # component-local CM positions, level-synchronous; cnt tracks each
        # component's assigned count (broadcast-size relation per level)
        st = _ck(start.select("vertex", "comp", F.lit(0).cast("long").alias("cpos")))
        frontier = st
        cnt = _ck(st.groupBy("comp").agg(F.count(F.lit(1)).alias("n_assigned")))
        depth = 0
        while True:
            cand = (
                und.join(frontier.select(F.col("vertex").alias("a"), "cpos"), "a")
                .groupBy(F.col("b").alias("vertex"))
                .agg(F.min("cpos").alias("ppos"))
                .join(st.select("vertex"), "vertex", "left_anti")
                .join(deg, "vertex")
                .join(cv, "vertex")
            )
            if cand.isEmpty():
                break
            depth += 1
            if depth > max_rounds:
                raise RuntimeError("cuthill_mckee: BFS exceeded max_rounds")
            w_lvl = Window.partitionBy("comp").orderBy("ppos", "degree", "vertex")
            frontier = _ck(
                cand.join(cnt, "comp")
                .select(
                    "vertex", "comp",
                    (F.col("n_assigned") + F.row_number().over(w_lvl) - 1).alias("cpos"),
                )
            )
            st = _ck(st.unionAll(frontier))
            cnt = _ck(st.groupBy("comp").agg(F.count(F.lit(1)).alias("n_assigned")))
        # global offsets: components consecutive in ascending comp label
        w_off = Window.orderBy("comp").rowsBetween(Window.unboundedPreceding, -1)
        off = cnt.select(
            "comp", F.coalesce(F.sum("n_assigned").over(w_off), F.lit(0)).alias("off"),
            "n_assigned",
        )
        if reverse:
            pos_expr = F.col("off") + (F.col("n_assigned") - 1 - F.col("cpos"))
        else:
            pos_expr = F.col("off") + F.col("cpos")
        out = (
            st.join(off, "comp")
            .select("vertex", pos_expr.cast("long").alias("pos"))
            .localCheckpoint(eager=True)
        )
        n = out.count()
        return out, {"mode": "shuffle", "depth": depth, "n": n}
    finally:
        for df in scratch:
            release(df)
