"""Unit tests: association_rules (olap.py), mutual_knn_graph
(similarity.py), scc_condensation (scc.py) — handcrafted semantics the
sf-fixture oracles don't isolate."""

from __future__ import annotations

from split_merge_partitioner_spark.functions.olap import association_rules
from split_merge_partitioner_spark.functions.similarity import mutual_knn_graph
from split_merge_partitioner_spark.graph import scc_condensation


def test_association_rules_hand_computed(spark):
    # 4 baskets: {a,b} {a,b} {a,c} {b}; pair (a,b) co-occurs 2x.
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    b = spark.createDataFrame(rows, "basket_id long, item string")
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(b, min_pairs=2).collect()
    }
    assert set(out) == {("a", "b"), ("b", "a")}
    ab = out[("a", "b")]
    # n_baskets=4, a_n=3, b_n=3, pair_n=2
    assert ab["pair_n"] == 2
    assert ab["support_ppm"] == 2 * 1000000 // 4
    assert ab["confidence_ppm"] == 2 * 1000000 // 3
    assert ab["lift_ppm"] == 2 * 1000000 * 4 // (3 * 3)
    ba = out[("b", "a")]
    assert ba["confidence_ppm"] == 2 * 1000000 // 3
    assert ba["lift_ppm"] == ab["lift_ppm"]  # lift is symmetric


def test_association_rules_max_basket_cap(spark):
    # one mega-basket of 30 items plus two tiny baskets; capping at 10
    # drops the mega-basket from pairs AND from n_baskets
    rows = [(99, f"i{j}") for j in range(30)]
    rows += [(1, "x"), (1, "y"), (2, "x"), (2, "y")]
    b = spark.createDataFrame(rows, "basket_id long, item string")
    out = association_rules(b, min_pairs=2, max_basket=10).collect()
    pairs = {(r["antecedent"], r["consequent"]): r for r in out}
    assert set(pairs) == {("x", "y"), ("y", "x")}
    assert pairs[("x", "y")]["support_ppm"] == 2 * 1000000 // 2  # n_baskets=2


def test_mutual_knn_prunes_asymmetric_links(spark):
    # hub geometry at k=1: b and c both pick a as nearest, a picks b.
    # mutual edges: only (a, b).
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # a
            (2, [0.9, 0.1]),   # b — closest to a
            (3, [0.8, -0.3]),  # c — closest to a, but a prefers b
            (4, [-1.0, 0.0]),  # d — far from everyone; picks c? (max dot)
        ],
        "vec_id long, embedding array<float>",
    )
    out = mutual_knn_graph(emb, k=1, bits=8).collect()
    got = {(r["src"], r["dst"]) for r in out}
    assert got == {(1, 2)}


def test_mutual_knn_accepts_prebuilt_knn(spark):
    from split_merge_partitioner_spark.functions.similarity import knn_quantized

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    knn = knn_quantized(emb, k=5, bits=8)
    via_knn = mutual_knn_graph(knn=knn).collect()
    direct = mutual_knn_graph(emb, k=5, bits=8).collect()
    assert sorted(map(tuple, via_knn)) == sorted(map(tuple, direct))
    # weights are symmetric integer dots; canonical orientation only
    assert all(r["src"] < r["dst"] for r in via_knn)


def test_scc_condensation_is_acyclic_dag(spark):
    # two 2-cycles {1,2} and {3,4} with edges 2->3 (x2 dedup) and 1->3
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 4), (4, 3), (2, 3), (2, 3), (1, 3)],
        "src long, dst long",
    )
    out = scc_condensation(edges).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["src_comp"], r["dst_comp"], r["n_edges"]) == (1, 3, 2)
    # composes with Kahn layering (provably acyclic: raises on any cycle)
    from split_merge_partitioner_spark.graph import topological_levels
    from pyspark.sql import functions as F

    cond = scc_condensation(edges)
    levels = topological_levels(
        cond.select(F.col("src_comp").alias("src"), F.col("dst_comp").alias("dst"))
    )
    assert {(r["vertex"], r["level"]) for r in levels.collect()} == {(1, 0), (3, 1)}
