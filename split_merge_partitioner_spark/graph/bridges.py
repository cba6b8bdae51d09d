"""Bridges and 2-edge-connected components via spanning-forest XOR
sketching (the cut-sketch trick behind Ahn-Guha-McGregor-style graph
sketches; folklore form: give every NON-tree edge a random value, set each
tree edge's value to the XOR of the non-tree edges whose tree path crosses
it — a tree edge is a bridge iff its value is 0, since crossing non-tree
edges are exactly the cycles covering it).

Here "random" is the seeded splitmix64 chain (graph/walks.py::_sm64, the
repo's cross-engine-replayable hash), masked to 62 bits, so the whole
pipeline is a pure function of (edges, seed): DETERMINISTIC, replayable in
DuckDB, retry/scale-out stable.  A non-bridge is misclassified only if the
XOR of its crossing set collides to 0 — probability 2^-62 per tree edge.

Crossing-set XOR without path walks: with S(v) = XOR of h over the
non-tree edges incident to v, the XOR over any vertex set U of S telescopes
to the XOR of non-tree edges with exactly ONE endpoint in U (both-in edges
cancel).  Taking U = the subtree under tree edge (parent, child) gives the
crossing XOR — so one bottom-up subtree aggregation replaces all path
computations.  Root choice is irrelevant to the flags (the crossing set of
an edge does not depend on orientation); both paths root at the per-tree
minimum vertex.

Phases (all diameter-bounded, nothing per-path):
  1. spanning forest = boruvka_msf with w=1 (unique under (w, src, dst) —
     the lexicographically least forest),
  2. S(v) by one bit_xor groupBy over the non-tree incidence,
  3. root/parent/depth by min-label propagation + BFS over TREE edges
     (unique parents — it's a tree),
  4. subtree XOR bottom-up by depth (one small aggregate per level),
  5. tree edge flag = (subtree_xor(child) == 0); non-tree edges are never
     bridges.
2-edge-connected components follow as connected components of the
non-bridge subgraph (helper below).

Dense path below ``dense_threshold`` runs the identical arithmetic
vectorized in NumPy (same splitmix64, same forest) — the kcore/onion dual
path; parity-tested, and correctness is pinned against a pure-Python
Tarjan bridge finder in tests.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..storage import release
from .mst import boruvka_msf
from .walks import _sm64

_MASK62 = (1 << 62) - 1
_U64 = np.uint64


def _sm64_np(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = x + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def _h_expr(seed: int):
    """62-bit edge hash: splitmix64(src*1000003 + dst + seed) & (2^62-1) —
    inputs < 2^63 pre-hash, so Spark's wrapping BIGINT and the oracle's
    HUGEINT replay agree bit for bit."""
    return _sm64(
        F.col("src") * F.lit(1000003) + F.col("dst") + F.lit(seed)
    ).bitwiseAND(F.lit(_MASK62))


def bridges(
    edges: DataFrame,
    seed: int = 42,
    max_rounds: int = 512,
    dense_threshold: int = 10_000_000,
) -> tuple[DataFrame, dict]:
    """((src, dst, is_bridge) DataFrame — one row per input edge, info).

    Input: canonical undirected simple edges (src < dst, deduped, no
    self-loops — every ``sources/edges.py`` builder's contract).
    """
    spark = edges.sparkSession
    e = edges.select(F.col("src").cast("long"), F.col("dst").cast("long"))
    m = e.count()
    if m == 0:
        out = spark.createDataFrame([], "src long, dst long, is_bridge boolean")
        return out, {"mode": "empty", "depth": 0}
    if m <= dense_threshold:
        return _bridges_dense(spark, e, seed, max_rounds)
    return _bridges_shuffle(spark, e, seed, max_rounds)


def _bridges_dense(spark, e: DataFrame, seed: int, max_rounds: int):
    pdf = e.toPandas()
    es = pdf["src"].to_numpy(np.int64)
    ed = pdf["dst"].to_numpy(np.int64)
    verts = np.unique(np.concatenate([es, ed]))
    n = len(verts)
    s = np.searchsorted(verts, es)
    d = np.searchsorted(verts, ed)
    # 1. forest (w = 1): reuse the MSF kernel's uniqueness
    we = e.withColumn("w", F.lit(1).cast("long"))
    forest, _ = boruvka_msf(we, dense_threshold=2**62)
    fp = forest.toPandas()
    tree_keys = set(zip(fp["src"].tolist(), fp["dst"].tolist()))
    is_tree = np.fromiter(
        ((a, b) in tree_keys for a, b in zip(es.tolist(), ed.tolist())),
        bool,
        len(es),
    )
    # 2. S(v): xor of h over incident NON-tree edges
    with np.errstate(over="ignore"):
        h = _sm64_np(
            es.astype(_U64) * _U64(1000003) + ed.astype(_U64) + _U64(seed)
        ) & _U64(_MASK62)
    S = np.zeros(n, _U64)
    nt = ~is_tree
    np.bitwise_xor.at(S, s[nt], h[nt])
    np.bitwise_xor.at(S, d[nt], h[nt])
    # 3. root at per-tree min via BFS over tree adjacency
    ts, td = s[is_tree], d[is_tree]
    adj_s = np.concatenate([ts, td])
    adj_d = np.concatenate([td, ts])
    order = np.argsort(adj_s, kind="stable")
    adj_s, adj_d = adj_s[order], adj_d[order]
    starts = np.searchsorted(adj_s, np.arange(n + 1))
    parent = np.full(n, -1, np.int64)
    depth = np.full(n, -1, np.int64)
    # component min-roots: min-label propagation (vectorized, diameter passes)
    lab = np.arange(n, dtype=np.int64)
    for _ in range(max_rounds):
        nl = lab.copy()
        np.minimum.at(nl, adj_s, lab[adj_d])
        if np.array_equal(nl, lab):
            break
        lab = nl
    else:
        raise RuntimeError("bridges: min-label did not converge")
    roots = np.unique(lab)
    depth[roots] = 0
    frontier = roots
    dmax = 0
    while len(frontier):
        dmax += 1
        if dmax > max_rounds:
            raise RuntimeError("bridges: BFS exceeded max_rounds")
        idx = np.concatenate(
            [adj_d[starts[v]: starts[v + 1]] for v in frontier]
        ) if len(frontier) else np.empty(0, np.int64)
        par = np.concatenate(
            [np.full(starts[v + 1] - starts[v], v) for v in frontier]
        ) if len(frontier) else np.empty(0, np.int64)
        fresh = depth[idx] < 0
        idx, par = idx[fresh], par[fresh]
        parent[idx] = par
        depth[idx] = dmax
        frontier = np.unique(idx)
    dmax = int(depth.max(initial=0))
    # 4. bottom-up subtree xor by depth
    sx = S.copy()
    for dd in range(dmax, 0, -1):
        at = np.nonzero(depth == dd)[0]
        np.bitwise_xor.at(sx, parent[at], sx[at])
    # 5. flags: tree edge bridge iff subtree_xor(child) == 0
    child = np.where(depth[ts] > depth[td], ts, td)
    flag_tree = sx[child] == _U64(0)
    is_bridge = np.zeros(len(es), bool)
    is_bridge[is_tree] = flag_tree
    out = spark.createDataFrame(
        [(int(a), int(b), bool(f)) for a, b, f in zip(es, ed, is_bridge)],
        "src long, dst long, is_bridge boolean",
    )
    return out, {"mode": "dense", "depth": dmax}


def _bridges_shuffle(spark, e: DataFrame, seed: int, max_rounds: int):
    from ..sources.edges import vertices_of

    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    scratch: list[DataFrame] = []

    def _ck(df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=True)
        scratch.append(out)
        return out

    try:
        we = e.withColumn("w", F.lit(1).cast("long"))
        forest, _ = boruvka_msf(we, dense_threshold=0)
        tree = _ck(forest.select("src", "dst"))
        nontree = _ck(e.join(tree, ["src", "dst"], "left_anti"))
        hh = nontree.withColumn("h", _h_expr(seed))
        sv = _ck(
            hh.select(F.col("src").alias("vertex"), "h")
            .unionAll(hh.select(F.col("dst").alias("vertex"), "h"))
            .groupBy("vertex")
            .agg(F.expr("bit_xor(h)").alias("s"))
        )
        tb = _ck(
            tree.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionAll(
                tree.select(F.col("dst").alias("a"), F.col("src").alias("b"))
            )
        )
        # min-label to per-tree min roots (diameter rounds, early exit)
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
            raise RuntimeError("bridges: min-label did not converge")
        # BFS rooting over tree edges (unique parents on a tree)
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
            frontier = st.where(F.col("depth") == dmax).select(
                F.col("vertex").alias("a")
            )
            nxt = (
                tb.join(frontier, "a")
                .select(F.col("b").alias("vertex"), F.col("a").alias("np_"))
                .join(st.where(F.col("depth") >= 0).select("vertex"), "vertex", "left_anti")
            )
            if nxt.isEmpty():
                break
            dmax += 1
            if dmax > max_rounds:
                raise RuntimeError("bridges: BFS exceeded max_rounds")
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
        # bottom-up subtree xor by depth
        sx = _ck(
            st.join(sv, "vertex", "left").select(
                "vertex",
                "depth",
                "parent",
                F.coalesce("s", F.lit(0).cast("long")).alias("sx"),
            )
        )
        for dd in range(dmax, 0, -1):
            contrib = (
                sx.where(F.col("depth") == dd)
                .groupBy(F.col("parent").alias("vertex"))
                .agg(F.expr("bit_xor(sx)").alias("cx"))
            )
            sx = _ck(
                sx.join(contrib, "vertex", "left").select(
                    "vertex",
                    "depth",
                    "parent",
                    F.when(
                        F.col("cx").isNotNull(),
                        F.col("sx").bitwiseXOR(F.col("cx")),
                    )
                    .otherwise(F.col("sx"))
                    .alias("sx"),
                )
            )
        # flags: child endpoint = deeper endpoint of each tree edge
        dmap = sx.select("vertex", "depth", "sx")
        te = (
            tree.join(
                dmap.select(
                    F.col("vertex").alias("src"),
                    F.col("depth").alias("ds"),
                    F.col("sx").alias("xs"),
                ),
                "src",
            )
            .join(
                dmap.select(
                    F.col("vertex").alias("dst"),
                    F.col("depth").alias("dd"),
                    F.col("sx").alias("xd"),
                ),
                "dst",
            )
            .select(
                "src",
                "dst",
                (
                    F.when(F.col("ds") > F.col("dd"), F.col("xs")).otherwise(
                        F.col("xd")
                    )
                    == 0
                ).alias("is_bridge"),
            )
        )
        out = (
            e.join(te, ["src", "dst"], "left")
            .select("src", "dst", F.coalesce("is_bridge", F.lit(False)).alias("is_bridge"))
            .localCheckpoint(eager=True)
        )
        return out, {"mode": "shuffle", "depth": dmax}
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        for df in scratch:
            release(df)


def two_edge_components(
    edges: DataFrame, seed: int = 42, dense_threshold: int = 10_000_000
) -> tuple[DataFrame, dict]:
    """(vertex, component) of the 2-edge-connected components: connected
    components after deleting the bridges (component = min member vertex
    via the oracle-checked star-contraction CC)."""
    from .components import connected_components_stars

    flags, info = bridges(edges, seed=seed, dense_threshold=dense_threshold)
    keep = flags.where(~F.col("is_bridge")).select("src", "dst")
    from ..sources.edges import vertices_of

    labels, cinfo = connected_components_stars(keep)
    verts = vertices_of(edges.select("src", "dst"))
    out = verts.join(labels, "vertex", "left").select(
        "vertex", F.coalesce("component", F.col("vertex")).alias("component")
    )
    return out, {**info, "cc_rounds": cinfo.get("rounds")}
