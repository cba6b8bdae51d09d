"""Butterfly counting (graph/butterflies.py) against a brute-force NumPy
4-cycle enumerator, and layer-wise neighbor sampling
(graph/neighbor_sample.py) against a pure-Python replay of the documented
Lehmer ranking — both independent reimplementations of the semantics, the
same bar the DuckDB contract oracles hold the driver queries to."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from split_merge_partitioner_spark.functions.sampling import M31, _A1, _A2
from split_merge_partitioner_spark.graph import (
    butterflies_per_vertex,
    butterfly_count,
    layerwise_neighbor_sample,
)

M31_ = M31


def _lehmer(k: int, seed: int) -> int:
    h = ((k % M31_ + M31_) % M31_ + seed % M31_ + 1) % M31_
    return ((h * _A1) % M31_ + 1) * _A2 % M31_


def _rand_bipartite(seed: int, nl: int = 40, nr: int = 12, m: int = 220):
    """Deterministic pseudo-random bipartite edge set (left 0..nl-1, right
    1000..1000+nr-1), parallel-edge-free."""
    es = set()
    x = seed
    while len(es) < m:
        x = _lehmer(x, seed)
        u = x % nl
        x = _lehmer(x, seed + 1)
        v = 1000 + x % nr
        es.add((u, v))
    return sorted(es)


def _brute_butterflies(es):
    """Pairs of RIGHT-side vertices sharing left neighbors (the butterfly
    total is side-symmetric; the per-vertex table is of the non-wedge
    side, which for these fixtures is the right side — see the volume
    assertion in the test)."""
    nbrs: dict[int, set[int]] = {}
    for u, v in es:
        nbrs.setdefault(v, set()).add(u)
    total = 0
    per: dict[int, int] = {}
    for a, b in combinations(sorted(nbrs), 2):
        c = len(nbrs[a] & nbrs[b])
        k = c * (c - 1) // 2
        total += k
        per[a] = per.get(a, 0) + k
        per[b] = per.get(b, 0) + k
    return total, {v: k for v, k in per.items() if k > 0}


@pytest.mark.parametrize("seed", [7, 19])
def test_butterfly_count_matches_bruteforce(spark, seed):
    es = _rand_bipartite(seed)
    edges = spark.createDataFrame(es, "src long, dst long")
    row = butterfly_count(edges).collect()[0]
    # left side (40 verts, deg ~5.5, Sigma C(d,2) ~ 500) has the smaller
    # wedge volume than the right (12 verts, deg ~18, ~1800): wedges go
    # THROUGH the left, pairs/per-vertex rows are right-side
    exp_total, exp_per = _brute_butterflies(es)
    assert row["wedge_side"] == "src"
    assert row["n_butterflies"] == exp_total
    got = {
        r["vertex"]: r["n_butterflies"]
        for r in butterflies_per_vertex(edges).collect()
    }
    assert got == exp_per


def test_butterfly_center_cap_undercounts_monotonically(spark):
    es = _rand_bipartite(3)
    edges = spark.createDataFrame(es, "src long, dst long")
    full = butterfly_count(edges).collect()[0]["n_butterflies"]
    capped = butterfly_count(edges, max_center_degree=10).collect()[0][
        "n_butterflies"
    ]
    assert 0 <= capped <= full


def _py_neighbor_sample(es, fanouts, seed, frac):
    adj: dict[int, list[int]] = {}
    for u, v in es:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)
    frontier = sorted(
        u for u in adj if _lehmer(u, seed) < int(frac * M31_)
    )
    out = []
    for hop, f in enumerate(fanouts, start=1):
        nxt = set()
        for u in frontier:
            ranked = sorted(
                adj.get(u, []), key=lambda v: (_lehmer(u * 2_097_169 + v, seed + hop), v)
            )[:f]
            for rn, v in enumerate(ranked, start=1):
                out.append((hop, u, v, rn))
                nxt.add(v)
        frontier = sorted(nxt)
    return sorted(out)


def test_neighbor_sample_matches_python_replay(spark):
    es = _rand_bipartite(11)
    edges = spark.createDataFrame(es, "src long, dst long")
    got = sorted(
        (r["hop"], r["src"], r["dst"], r["rn"])
        for r in layerwise_neighbor_sample(
            edges, fanouts=(3, 2), seed=42, seed_fraction=0.2
        ).collect()
    )
    assert got == _py_neighbor_sample(es, (3, 2), 42, 0.2)
    assert len(got) > 0


def test_neighbor_sample_partitioning_invariant(spark):
    """Pure-function-of-(ids, seed) contract: identical picks regardless of
    input partitioning."""
    es = _rand_bipartite(23)
    a = spark.createDataFrame(es, "src long, dst long").repartition(1)
    b = spark.createDataFrame(es, "src long, dst long").repartition(7, "dst")
    ra = sorted(map(tuple, layerwise_neighbor_sample(a, (2, 2)).collect()))
    rb = sorted(map(tuple, layerwise_neighbor_sample(b, (2, 2)).collect()))
    assert ra == rb


def test_neighbor_sample_respects_fanout_and_validates(spark):
    es = _rand_bipartite(5)
    edges = spark.createDataFrame(es, "src long, dst long")
    df = layerwise_neighbor_sample(edges, fanouts=(2,), seed_fraction=0.5)
    per_src = df.groupBy("hop", "src").agg(F.count("*").alias("c"))
    assert per_src.where(F.col("c") > 2).count() == 0
    with pytest.raises(ValueError):
        layerwise_neighbor_sample(edges, fanouts=())
    with pytest.raises(ValueError):
        layerwise_neighbor_sample(edges, fanouts=(2, 0))


def test_rich_club_matches_bruteforce(spark):
    from collections import Counter

    from split_merge_partitioner_spark.graph import rich_club

    es = _rand_bipartite(31, nl=25, nr=10, m=120)
    edges = spark.createDataFrame(es, "src long, dst long")
    got = sorted(map(tuple, rich_club(edges).collect()))
    deg = Counter()
    for a, b in es:
        deg[a] += 1
        deg[b] += 1
    exp = []
    for k in sorted(set(deg.values())):
        vs = {v for v in deg if deg[v] > k}
        if len(vs) < 2:
            continue
        ek = sum(1 for a, b in es if a in vs and b in vs)
        exp.append((k, len(vs), ek, (2 * ek * 10**6) // (len(vs) * (len(vs) - 1))))
    assert got == sorted(exp)


def test_edge_support_matches_bruteforce(spark):
    from itertools import combinations as _comb

    from split_merge_partitioner_spark.graph.triangles import edge_support

    # K5 minus one edge + a pendant: known support structure
    vs = list(range(5))
    es = [e for e in _comb(vs, 2) if e != (0, 1)] + [(4, 9)]
    edges = spark.createDataFrame(es, "src long, dst long")
    got = {(r["src"], r["dst"]): r["support"] for r in edge_support(edges).collect()}
    nbrs: dict[int, set[int]] = {}
    for a, b in es:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    exp = {
        (a, b): len(nbrs[a] & nbrs[b])
        for a, b in es
        if len(nbrs[a] & nbrs[b]) > 0
    }
    assert got == exp


def test_edge_support_orientation_invariant(spark):
    from split_merge_partitioner_spark.graph.triangles import edge_support

    es = _rand_bipartite(41, nl=20, nr=20, m=100)
    # make it non-bipartite so triangles exist: add left-left edges
    es = sorted(set(es + [(i, i + 1) for i in range(0, 19)]))
    edges = spark.createDataFrame(es, "src long, dst long")
    a = sorted(map(tuple, edge_support(edges, orient="degree").collect()))
    b = sorted(map(tuple, edge_support(edges, orient="id").collect()))
    assert a == b


def test_directed_summary_hand_values(spark):
    from split_merge_partitioner_spark.graph.summary import directed_summary

    # mutual pair (1,2)/(2,1), one-way (1,3), self-loop (4,4), duplicate row
    es = [(1, 2), (2, 1), (1, 3), (4, 4), (1, 3)]
    edges = spark.createDataFrame(es, "src long, dst long")
    r = directed_summary(edges).collect()[0]
    assert (r["m"], r["n_self_loops"], r["n_reciprocal"]) == (4, 1, 2)
    assert r["reciprocity_ppm"] == (2 * 10**6) // 3


def test_butterfly_total_is_side_symmetric_hypothesis():
    """The identity butterfly side-selection RELIES on: Sigma C(c,2) over
    left-pairs == over right-pairs, for arbitrary bipartite graphs (pure
    Python — no Spark, so hypothesis can hammer it)."""
    from itertools import combinations as _comb

    from hypothesis import given, settings
    from hypothesis import strategies as st

    def total_through(es, left):
        nbrs: dict[int, set[int]] = {}
        for a, b in es:
            k, v = (a, b) if left else (b, a)
            nbrs.setdefault(k, set()).add(v)
        return sum(
            len(nbrs[x] & nbrs[y]) * (len(nbrs[x] & nbrs[y]) - 1) // 2
            for x, y in _comb(sorted(nbrs), 2)
        )

    @settings(max_examples=60, deadline=None)
    @given(
        st.sets(
            st.tuples(st.integers(0, 12), st.integers(100, 108)),
            min_size=1,
            max_size=60,
        )
    )
    def check(es):
        es = sorted(es)
        assert total_through(es, True) == total_through(es, False)

    check()


def test_avg_neighbor_degree_hand_values(spark):
    from split_merge_partitioner_spark.graph.summary import avg_neighbor_degree

    # star 0-{1,2,3}: center deg 3 (nbr degs 1,1,1), leaves deg 1 (nbr 3)
    edges = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    got = {r["degree"]: r for r in avg_neighbor_degree(edges).collect()}
    assert (got[3]["n_vertices"], got[3]["knn_ppm"]) == (1, (3 * 10**6) // 3)
    assert (got[1]["n_vertices"], got[1]["knn_ppm"]) == (3, (9 * 10**6) // 3)


def test_source_profile_hand_values(spark):
    from split_merge_partitioner_spark.functions.profiling import source_profile

    docs = spark.createDataFrame(
        [(1, "aaa", "en", "web"), (2, "aaa", "en", "web"), (3, "bbbb", "de", "web"),
         (4, "cc", "fr", "book")],
        "doc_id long, text string, lang string, source string",
    )
    got = {r["source"]: r for r in source_profile(docs).collect()}
    w = got["web"]
    assert (w["n_docs"], w["n_unique_texts"], w["sum_chars"], w["mean_chars"], w["langs"]) == (3, 2, 10, 3, 2)
    b = got["book"]
    assert (b["n_docs"], b["n_unique_texts"], b["langs"]) == (1, 1, 1)


def test_source_overlap_hand_values(spark):
    from split_merge_partitioner_spark.functions.profiling import source_overlap

    docs = spark.createDataFrame(
        [
            (1, "a b c d", "s1"),       # 2-grams: {a b, b c, c d}
            (2, "b c d e", "s2"),       # {b c, c d, d e}
            (3, "x y", "s3"),           # {x y} — no overlap with anyone
            (4, "a b c d", "s1"),       # duplicate text, same source: no effect
        ],
        "doc_id long, text string, source string",
    )
    out = {
        (r.src_a, r.src_b): (r.n_shared, r.n_a, r.n_b, r.jaccard_ppm)
        for r in source_overlap(docs, n=2).collect()
    }
    # s1 ∩ s2 = {b c, c d} -> 2; |s1|=3, |s2|=3; J = 2/4 = 500000 ppm
    assert out == {("s1", "s2"): (2, 3, 3, 500_000)}


def test_source_overlap_short_docs_yield_no_grams(spark):
    from split_merge_partitioner_spark.functions.profiling import source_overlap

    docs = spark.createDataFrame(
        [(1, "one", "s1"), (2, "one", "s2")], "doc_id long, text string, source string"
    )
    # 5-grams of a 1-token doc: none -> empty overlap matrix
    assert source_overlap(docs, n=5).count() == 0


def test_exact_percentiles_hand_values(spark):
    from split_merge_partitioner_spark.functions.profiling import exact_percentiles

    # values 1..10 -> p50 = 5 (ceil(0.5*10)=5th), p90 = 9, p99 = 10
    df = spark.createDataFrame([(float(i),) for i in range(1, 11)], "value double")
    out = {r.p_ppm: (r.value_micros, r.cum_count, r.n_rows)
           for r in exact_percentiles(df).collect()}
    assert out == {
        500_000: (5_000_000, 5, 10),
        900_000: (9_000_000, 9, 10),
        990_000: (10_000_000, 10, 10),
    }


def test_exact_percentiles_duplicates_and_edges(spark):
    import pytest as _pytest

    from split_merge_partitioner_spark.functions.profiling import exact_percentiles

    # heavy duplicates: [1,1,1,2]: p50 -> ceil(2) = 2nd value = 1
    df = spark.createDataFrame([(1.0,), (1.0,), (1.0,), (2.0,)], "value double")
    out = {r.p_ppm: r.value_micros
           for r in exact_percentiles(df, percentiles_ppm=(500_000, 1_000_000)).collect()}
    assert out == {500_000: 1_000_000, 1_000_000: 2_000_000}
    with _pytest.raises(ValueError):
        exact_percentiles(df, percentiles_ppm=())
    with _pytest.raises(ValueError):
        exact_percentiles(df, percentiles_ppm=(0,))
