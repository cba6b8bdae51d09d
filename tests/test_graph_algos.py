"""Iterative analytics vs NumPy oracles (north_rule correctness targets):
PageRank allclose 1e-6, CC/LP exact, triangles exact — and invariance of the
results across partitioner choice."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.graph import (
    connected_components,
    label_propagation,
    pagerank,
    triangle_count,
    triangles_per_vertex,
)
from split_merge_partitioner_spark.operators import dbh_partition, fsm_partition
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf, tiny_graph_pdf
from tests.oracles import (
    components_oracle,
    label_propagation_oracle,
    pagerank_oracle,
    triangle_count_oracle,
)


@pytest.fixture(scope="module")
def graph(spark):
    pdf = powerlaw_edges_pdf(n=300, m_per_node=4)
    # add a second small component to exercise CC properly
    extra = pd.DataFrame({"src": [1000, 1001, 1000], "dst": [1001, 1002, 1002]})
    pdf = pd.concat([pdf, extra], ignore_index=True)
    edges = spark.createDataFrame(pdf).persist()
    edges.count()
    assigned = fsm_partition(edges, p=4, k=2, merge="fast", splitter="ne_local").assigned.persist()
    assigned.count()
    return pdf, edges, assigned


def _ranks_np(df):
    p = df.toPandas().sort_values("vertex")
    return p["vertex"].to_numpy(), p.iloc[:, 1].to_numpy()


def test_pagerank_converged_allclose_1e6(spark, graph):
    """north_rule: PageRank allclose 1e-6 at convergence (GAS over FSM parts).

    Spark converges at block-delta 1e-7; remaining distance to the fixpoint is
    bounded by delta/(1-d) ~ 6.7e-7 < 1e-6 vs the tightly-converged oracle."""
    pdf, edges, assigned = graph
    ranks, info = pagerank(edges, assigned=assigned, mode="gas", tol=1e-7, max_iter=300)
    v_got, r_got = _ranks_np(ranks)
    oracle = pagerank_oracle(pdf, tol=1e-13)
    assert info["converged"]
    np.testing.assert_array_equal(v_got, oracle.vertex.to_numpy())
    np.testing.assert_allclose(r_got, oracle["rank"].to_numpy(), atol=1e-6)


@pytest.mark.parametrize(
    "mode,thr,combine",
    [
        ("gas", 5_000_000, "auto"),
        ("gas", 0, "jvm"),
        ("gas", 0, "mirror"),
        ("gas", 0, "cogroup"),
        ("join", 5_000_000, "auto"),
    ],
    ids=["gas-broadcast", "gas-shuffle-jvm", "gas-shuffle-mirror",
         "gas-shuffle-cogroup", "join"],
)
def test_pagerank_fixed_iterations_exact(spark, graph, mode, thr, combine):
    """Step-for-step computational equivalence with the oracle (20 supersteps,
    no convergence short-circuit) — catches any semantic drift.  Covers all
    five execution paths: broadcast-GAS (raw RDD), distributed JVM superstep
    (the cluster-scale default), PowerGraph-volume mirror superstep,
    distributed cogroup kernel (A/B floor), join."""
    pdf, edges, assigned = graph
    ranks, _ = pagerank(
        edges, assigned=assigned, mode=mode, tol=0.0, max_iter=20,
        broadcast_threshold=thr, combine=combine,
    )
    v_got, r_got = _ranks_np(ranks)
    oracle = pagerank_oracle(pdf, tol=-1.0, max_iter=20)
    np.testing.assert_allclose(r_got, oracle["rank"].to_numpy(), atol=1e-12)


def test_pagerank_invariant_to_partitioner(spark, graph):
    pdf, edges, _ = graph
    a_dbh = dbh_partition(edges, 4)
    ranks, _ = pagerank(edges, assigned=a_dbh, mode="gas", tol=0.0, max_iter=20)
    v_got, r_got = _ranks_np(ranks)
    oracle = pagerank_oracle(pdf, tol=-1.0, max_iter=20)
    np.testing.assert_allclose(r_got, oracle["rank"].to_numpy(), atol=1e-12)


@pytest.mark.parametrize(
    "mode,thr", [("gas", 5_000_000), ("gas", 0), ("join", 5_000_000)]
)
def test_connected_components_exact(spark, graph, mode, thr):
    pdf, edges, assigned = graph
    comps, info = connected_components(
        edges, assigned=assigned, mode=mode, broadcast_threshold=thr
    )
    assert info["converged"]
    got = comps.toPandas().sort_values("vertex").reset_index(drop=True)
    exp = components_oracle(pdf).sort_values("vertex").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    # the planted extra component is found
    assert got.set_index("vertex").loc[1002, "component"] == 1000


@pytest.mark.parametrize(
    "mode,thr", [("gas", 5_000_000), ("gas", 0), ("join", 5_000_000)]
)
def test_label_propagation_exact(spark, graph, mode, thr):
    pdf, edges, assigned = graph
    got = (
        label_propagation(
            edges, assigned=assigned, n_iter=4, mode=mode, broadcast_threshold=thr
        )
        .toPandas()
        .sort_values("vertex")
        .reset_index(drop=True)
    )
    exp = label_propagation_oracle(pdf, n_iter=4).sort_values("vertex").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_connected_components_stars_exact(spark, graph):
    """Star contraction (Kiveris SoCC 2014) matches the union-find oracle on
    the power-law + planted-component fixture, converging in O(log^2 n)
    rounds (far below the 50 cap)."""
    from split_merge_partitioner_spark.graph import connected_components_stars

    pdf, edges, _ = graph
    comps, info = connected_components_stars(edges)
    assert info["converged"] and info["rounds"] <= 10
    got = comps.toPandas().sort_values("vertex").reset_index(drop=True)
    exp = components_oracle(pdf).sort_values("vertex").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_connected_components_stars_high_diameter(spark):
    """The case star contraction exists for: a 200-vertex path (diameter
    199) resolves in a handful of rounds where label propagation would
    need ~200 supersteps; plus disconnected pieces and reversed/dup edges."""
    from split_merge_partitioner_spark.graph import connected_components_stars

    path = [(i, i + 1) for i in range(199)]
    messy = [(500, 400), (400, 500), (600, 600)]  # reversed dup + self-loop
    e = spark.createDataFrame(path + messy, "src long, dst long")
    comps, info = connected_components_stars(e)
    assert info["converged"] and info["rounds"] <= 12
    got = {r["vertex"]: r["component"] for r in comps.collect()}
    assert all(got[v] == 0 for v in range(200))
    assert got[400] == got[500] == 400
    assert got[600] == 600  # self-loop-only vertex is its own component


def test_triangles_exact(spark, graph):
    pdf, edges, _ = graph
    assert triangle_count(edges) == triangle_count_oracle(pdf)
    assert triangle_count(edges, orient="degree") == triangle_count_oracle(pdf)
    per_v = triangles_per_vertex(edges).agg({"triangles": "sum"}).collect()[0][0]
    assert per_v == 3 * triangle_count_oracle(pdf)


def test_triangle_count_sampled_doulion(spark, graph):
    """Doulion semantics: p=1 keeps every edge (estimate == exact count);
    p>1 counts triangles on the deterministic hash-sparsified subgraph and
    scales by p^3 — replayed edge-by-edge in Python."""
    from split_merge_partitioner_spark.functions.sampling import M31, _A1, _A2
    from split_merge_partitioner_spark.graph import triangle_count_sampled

    pdf, edges, _ = graph
    exact = triangle_count_oracle(pdf)
    r1 = triangle_count_sampled(edges, p=1, seed=42).collect()[0]
    assert r1["estimate"] == r1["tri_sampled"] == exact

    def lehmer(k, seed=42):
        h = ((k % M31 + M31) % M31 + seed % M31 + 1) % M31
        return ((h * _A1) % M31 + 1) * _A2 % M31

    p = 3
    kept = {
        (a, b)
        for a, b in zip(pdf["src"], pdf["dst"])
        if lehmer(int(a) * 1000003 + int(b)) < M31 // p
    }
    # exact triangle count on the kept subgraph (python reference)
    adj = {}
    for a, b in kept:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # count each triangle once: edge (a, b) closed by a common neighbor
    # c greater than both corners
    tri = sum(1 for a, b in kept for c in (adj[a] & adj[b]) if c > max(a, b))
    rp = triangle_count_sampled(edges, p=p, seed=42).collect()[0]
    assert rp["p"] == p
    assert rp["n_edges_sampled"] == len(kept)
    assert rp["tri_sampled"] == tri
    assert rp["estimate"] == tri * p**3


def test_triangles_tiny_by_hand(spark):
    # tiny graph: square A (0,1,2,3 + chords 0-2, 1-3) has 4 triangles;
    # square B (4,5,6,7 + chord 5-7) has 2; bridge adds none.
    e = spark.createDataFrame(tiny_graph_pdf())
    assert triangle_count(e) == 6


@pytest.mark.parametrize("thr", [5_000_000, 0])
def test_bfs_and_double_sweep_diameter(spark, graph, thr):
    """Double-sweep AD (full.pdf §5.4's third workload) vs a NumPy BFS oracle:
    BFS distances exact from the deterministic seed; the double-sweep result
    is a valid diameter lower bound that is exact on these small-diameter
    fixtures (checked against all-pairs eccentricity from the two sweeps'
    endpoints).  thr=0 forces the fully distributed cogroup sweep (no O(n)
    driver state), thr=5M the dense broadcast path — results must agree."""
    from collections import deque

    from split_merge_partitioner_spark.graph import (
        approximate_diameter,
        bfs_distances,
    )

    pdf, edges, assigned = graph

    adj = {}
    for r in pdf.itertuples():
        adj.setdefault(r.src, set()).add(r.dst)
        adj.setdefault(r.dst, set()).add(r.src)

    def bfs(src):
        dist = {src: 0}
        q = deque([src])
        while q:
            v = q.popleft()
            for u in adj[v]:
                if u not in dist:
                    dist[u] = dist[v] + 1
                    q.append(u)
        return dist

    deg = {v: len(ns) for v, ns in adj.items()}
    seed = min(v for v in deg if deg[v] == max(deg.values()))
    got = bfs_distances(edges, seed, assigned=assigned, broadcast_threshold=thr)
    got_pdf = got.toPandas().set_index("vertex")["dist"].to_dict()
    exp = bfs(seed)
    assert got_pdf == exp

    res, info = approximate_diameter(edges, assigned=assigned, broadcast_threshold=thr)
    row = res.collect()[0]
    assert row["seed"] == seed
    # oracle: eccentricity of the reported far vertex
    exp_d1 = bfs(seed)
    ecc1 = max(exp_d1.values())
    far = min(v for v, d in exp_d1.items() if d == ecc1)
    assert row["far_vertex"] == far
    assert row["diameter"] == max(bfs(far).values())
    assert row["diameter"] >= ecc1  # sweep-2 bound dominates sweep 1


def test_diameter_empty_graph(spark):
    """ADVICE r2: empty edge set must return an empty result, not raise."""
    from split_merge_partitioner_spark.graph import approximate_diameter, bfs_distances

    e = spark.createDataFrame([], "src long, dst long")
    res, info = approximate_diameter(e)
    assert res.count() == 0 and info["component_size"] == 0
    assert bfs_distances(e, 0).count() == 0


def test_local_clustering_triangle_graph(spark):
    """Triangle + pendant: lcc 1.0 on the triangle corners except the corner
    with the pendant (2/3... recompute), 0 for the degree-1 vertex."""
    import pandas as pd

    from split_merge_partitioner_spark.graph import local_clustering

    e = spark.createDataFrame(
        pd.DataFrame({"src": [1, 1, 2, 3], "dst": [2, 3, 3, 4]})
    )
    got = {r.vertex: (r.degree, r.triangles, r.lcc)
           for r in local_clustering(e).collect()}
    assert got[1] == (2, 1, 1.0)
    assert got[2] == (2, 1, 1.0)
    # vertex 3 has degree 3 (1,2,4) and one triangle: 2*1/(3*2) = 1/3
    assert got[3][0] == 3 and got[3][1] == 1 and abs(got[3][2] - 1 / 3) < 1e-6
    assert got[4] == (1, 0, 0.0)


def test_link_suggestions_square_graph(spark):
    """4-cycle 1-2-3-4: the two diagonals are the (only) suggestions, each
    with 2 common neighbors; adjacent pairs are excluded."""
    import pandas as pd

    from split_merge_partitioner_spark.graph import link_suggestions

    e = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 4, 4]})
    )
    got = link_suggestions(e, k=3, min_common=2).toPandas()
    pairs = {(r.vertex, r.candidate): (r.common, r.jaccard, r.adamic_adar)
             for r in got.itertuples()}
    # diagonals 1-3 and 2-4, mirrored per vertex
    assert set(pairs) == {(1, 3), (3, 1), (2, 4), (4, 2)}
    common, jac, aa = pairs[(1, 3)]
    assert common == 2
    assert abs(jac - 2 / (2 + 2 - 2)) < 1e-9  # jaccard = 1.0
    import math
    assert abs(aa - 2 / math.log(2)) < 1e-6


def test_link_suggestions_canonicalizes_dirty_input(spark):
    """Reversed + duplicated edges and self-loops (what an arbitrary external
    parquet can contain) must give the SAME result as the canonical table —
    without canonicalization the anti-join misses reversed adjacency and
    degrees double-count (ADVICE r3)."""
    import pandas as pd

    from split_merge_partitioner_spark.graph import link_suggestions

    clean = pd.DataFrame({"src": [1, 2, 3, 1], "dst": [2, 3, 4, 4]})
    dirty = pd.DataFrame(
        {"src": [2, 2, 3, 1, 4, 5], "dst": [1, 1, 2, 4, 3, 5]}  # rev+dup+loop
    )
    got_clean = link_suggestions(spark.createDataFrame(clean), k=3).toPandas()
    got_dirty = link_suggestions(spark.createDataFrame(dirty), k=3).toPandas()
    key = ["vertex", "candidate"]
    pd.testing.assert_frame_equal(
        got_clean.sort_values(key).reset_index(drop=True),
        got_dirty.sort_values(key).reset_index(drop=True),
    )


def test_link_suggestions_default_cap_bounds_hub_wedges(spark):
    """Planted 10^4-degree star (deg² = 10^8 wedges, over the 2^26 budget
    floor) + a small clique: the default 'auto' volume-budget cap excludes
    the hub from wedge centers, so its spokes produce NO candidate pairs —
    wedge volume stays within max(2m·sqrt(2m), 2^26) — while clique-internal
    suggestions survive (the cap lands at the clique degree, the largest
    distinct degree whose truncated volume fits)."""
    import numpy as np
    import pandas as pd

    from split_merge_partitioner_spark.graph import link_suggestions

    nspoke = 10_000
    hub = pd.DataFrame({"src": np.zeros(nspoke, np.int64),
                        "dst": np.arange(1, nspoke + 1, dtype=np.int64)})
    # clique on 5 fresh vertices minus one edge -> that pair is a suggestion
    base = nspoke + 1001
    cl = [(a, b) for a in range(base, base + 5) for b in range(a + 1, base + 5)
          if (a, b) != (base, base + 1)]
    pdf = pd.concat([hub, pd.DataFrame(cl, columns=["src", "dst"])], ignore_index=True)
    got = link_suggestions(spark.createDataFrame(pdf), k=3, min_common=2).toPandas()
    pairs = set(zip(got.vertex, got.candidate))
    # hub spokes (common neighbor = only the 10^4-degree hub) are NOT paired
    assert not any(v <= nspoke and c <= nspoke for v, c in pairs)
    # clique pair via 3 low-degree common neighbors IS found
    assert (base, base + 1) in pairs and (base + 1, base) in pairs


def test_link_suggestions_auto_cap_uncaps_within_budget(spark):
    """On a small hub-dominated graph whose FULL wedge volume fits the 2^26
    budget floor, 'auto' must apply NO cap (round-4 regression: the old
    sqrt(2m) degree rule silently emptied linkpred on hub-dominated test
    graphs — every wedge ran through an excluded hub)."""
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf
    from split_merge_partitioner_spark.graph import link_suggestions

    e = spark.createDataFrame(powerlaw_edges_pdf(n=300, m_per_node=4))
    capped = link_suggestions(e).toPandas()
    uncapped = link_suggestions(e, max_center_degree=None).toPandas()
    assert len(capped) == len(uncapped) > 0


def test_degree_assortativity_known_structures(spark):
    """Star graph: perfectly disassortative (r = -1).  Cycle: every endpoint
    degree equal -> r undefined (0/0 -> NULL/NaN surfaced, not masked)."""
    import math

    import pandas as pd

    from split_merge_partitioner_spark.graph import degree_assortativity

    star = pd.DataFrame({"src": [0] * 6, "dst": range(1, 7)})
    row = degree_assortativity(spark.createDataFrame(star)).collect()[0]
    assert abs(row.assortativity + 1.0) < 1e-9
    assert row.m_edges == 6
    cyc = pd.DataFrame({"src": [0, 1, 2, 3], "dst": [1, 2, 3, 0]})
    r = degree_assortativity(spark.createDataFrame(cyc)).collect()[0].assortativity
    assert r is None or math.isnan(r)


def test_global_clustering_known_structures(spark):
    """K4: transitivity exactly 1.  Star: 0 triangles over many wedges."""
    import pandas as pd

    from split_merge_partitioner_spark.graph import global_clustering

    k4 = pd.DataFrame(
        {"src": [1, 1, 1, 2, 2, 3], "dst": [2, 3, 4, 3, 4, 4]}
    )
    row = global_clustering(spark.createDataFrame(k4)).collect()[0]
    assert row.n_triangles == 4 and row.n_wedges == 12
    assert abs(row.global_clustering - 1.0) < 1e-9
    star = pd.DataFrame({"src": [0] * 5, "dst": range(1, 6)})
    row = global_clustering(spark.createDataFrame(star)).collect()[0]
    assert row.n_triangles == 0 and row.global_clustering == 0.0


# ---------------------------------------------------------------------------
# Modularity (graph/modularity.py)
# ---------------------------------------------------------------------------

def _modularity_replay(pairs, labels):
    """Exact fraction replay of Newman modularity with Python ints."""
    from fractions import Fraction

    m = len(pairs)
    deg: dict[int, int] = {}
    for s, d in pairs:
        deg[s] = deg.get(s, 0) + 1
        deg[d] = deg.get(d, 0) + 1
    mc: dict[int, int] = {}
    dc: dict[int, int] = {}
    for v, degree in deg.items():
        dc[labels[v]] = dc.get(labels[v], 0) + degree
    for s, d in pairs:
        if labels[s] == labels[d]:
            mc[labels[s]] = mc.get(labels[s], 0) + 1
    q = sum(Fraction(mc.get(c, 0), m) - Fraction(dc[c], 2 * m) ** 2 for c in dc)
    return round(float(q), 6), len(dc)


def test_modularity_two_cliques_bridge(spark):
    import pandas as pd

    from split_merge_partitioner_spark.graph.modularity import modularity

    # two K4s joined by one bridge; ground-truth communities
    cl1 = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    cl2 = [(i, j) for i in range(10, 14) for j in range(i + 1, 14)]
    pairs = cl1 + cl2 + [(0, 10)]
    labels = {v: 0 for v in range(4)} | {v: 1 for v in range(10, 14)}
    e = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    lab = spark.createDataFrame(
        pd.DataFrame(labels.items(), columns=["vertex", "label"])
    )
    got = modularity(e, lab).collect()[0]
    exp_q, exp_nc = _modularity_replay(pairs, labels)
    assert got["modularity"] == exp_q
    assert got["n_communities"] == exp_nc
    assert got["m_edges"] == len(pairs)
    # good community structure scores high
    assert got["modularity"] > 0.4


def test_modularity_single_community_is_zero(spark):
    import pandas as pd

    from split_merge_partitioner_spark.graph.modularity import modularity

    # all vertices in one community: Q = m/m - (2m/2m)^2 = 0 exactly
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0)]
    e = spark.createDataFrame(pd.DataFrame(pairs, columns=["src", "dst"]))
    lab = spark.createDataFrame(
        pd.DataFrame({"vertex": [0, 1, 2, 3], "label": [7, 7, 7, 7]})
    )
    got = modularity(e, lab).collect()[0]
    assert got["modularity"] == 0.0
    assert got["n_communities"] == 1


def test_modularity_labelprop_composition(spark):
    import pandas as pd

    from split_merge_partitioner_spark.graph import label_propagation
    from split_merge_partitioner_spark.graph.modularity import modularity
    from split_merge_partitioner_spark.operators import dbh_partition
    from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

    pdf = powerlaw_edges_pdf(n=60, m_per_node=3)
    e = spark.createDataFrame(pdf).persist()
    labels = label_propagation(e, assigned=dbh_partition(e, 4), n_iter=5)
    got = modularity(e, labels).collect()[0]
    lab_map = {
        int(r["vertex"]): int(r["label"]) for r in labels.collect()
    }
    exp_q, exp_nc = _modularity_replay(
        list(zip(pdf["src"].astype(int), pdf["dst"].astype(int))), lab_map
    )
    assert got["modularity"] == exp_q
    assert got["n_communities"] == exp_nc
