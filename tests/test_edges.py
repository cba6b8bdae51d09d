"""Edge derivation, renumbering, degrees — vs pandas oracles."""

from __future__ import annotations

import numpy as np
import pandas as pd

from split_merge_partitioner_spark.sources import (
    canonicalize_edges,
    degrees,
    edges_from_lineitem,
    edges_from_repos,
    make_repos_df,
    powerlaw_edges_pdf,
    renumber_edges,
    repos_pandas,
    tiny_graph_pdf,
)
from tests.conftest import SF_DIR


def test_canonicalize(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"src": [1, 2, 2, 3, 5], "dst": [2, 1, 2, 1, 4]})
    )
    out = canonicalize_edges(df).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    exp = pd.DataFrame({"src": [1, 1, 4], "dst": [2, 3, 5]})
    pd.testing.assert_frame_equal(out, exp, check_dtype=False)


def test_edges_from_lineitem_matches_pandas(spark):
    got = edges_from_lineitem(spark, SF_DIR).toPandas()
    li = pd.read_parquet(f"{SF_DIR}/lineitem.parquet")[["l_orderkey", "l_suppkey"]]
    od = pd.read_parquet(f"{SF_DIR}/orders.parquet")[["o_orderkey", "o_custkey"]]
    j = li.merge(od, left_on="l_orderkey", right_on="o_orderkey")
    exp = (
        pd.DataFrame(
            {"src": j["o_custkey"], "dst": j["l_suppkey"] + 1_000_000}
        )
        .drop_duplicates()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    got = got.sort_values(["src", "dst"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got.src < got.dst).all()


def test_edges_from_repos_matches_pandas(spark):
    pdf = repos_pandas(n_repos=60)
    repos = make_repos_df(spark, n_repos=60)
    got = edges_from_repos(repos).toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    # pandas oracle: repos sharing a commit, dense repo id by sorted name
    names = sorted(pdf["repo"].unique())
    rid = {r: i for i, r in enumerate(names)}
    cr = pdf[["commit", "repo"]].drop_duplicates()
    cr["rid"] = cr["repo"].map(rid)
    m = cr.merge(cr, on="commit")
    lo = np.minimum(m["rid_x"], m["rid_y"])
    hi = np.maximum(m["rid_x"], m["rid_y"])
    exp = (
        pd.DataFrame({"src": lo, "dst": hi})
        .query("src != dst")
        .drop_duplicates()
        .sort_values(["src", "dst"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_renumber_dense(spark):
    e = spark.createDataFrame(pd.DataFrame({"src": [10, 30, 50], "dst": [30, 50, 99]}))
    ren, mapping = renumber_edges(e)
    mp = mapping.toPandas().sort_values("vertex").reset_index(drop=True)
    assert mp["vid"].tolist() == [0, 1, 2, 3]
    assert mp["vertex"].tolist() == [10, 30, 50, 99]
    rp = ren.toPandas().sort_values(["src", "dst"]).reset_index(drop=True)
    assert rp.values.tolist() == [[0, 1], [1, 2], [2, 3]]


def test_degrees_undirected(spark):
    e = spark.createDataFrame(tiny_graph_pdf())
    got = degrees(e).toPandas().sort_values("vertex").reset_index(drop=True)
    t = tiny_graph_pdf()
    exp = (
        pd.concat([t.src, t.dst]).value_counts().sort_index().rename_axis("vertex").reset_index(name="degree")
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_powerlaw_generator_properties():
    e = powerlaw_edges_pdf(n=500, m_per_node=5)
    assert (e.src < e.dst).all()
    assert not e.duplicated().any()
    deg = pd.concat([e.src, e.dst]).value_counts()
    avg = 2 * len(e) / deg.size
    # power-law shape: a genuine hub well above average
    assert deg.max() > 10 * avg


def test_bipartite_project_by_hand(spark):
    """3 customers sharing suppliers: (1,2) share {10,11}, (1,3) share {10},
    (2,3) share {10} — threshold 2 keeps only (1,2); weighted carries the
    shared count."""
    from split_merge_partitioner_spark.sources import bipartite_project

    e = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 10), (2, 11), (3, 10)], "src long, dst long"
    )
    import pytest as _pt

    all_pairs = sorted(
        map(tuple, bipartite_project(e, min_shared=1, weighted=True).collect())
    )
    assert all_pairs == [(1, 2, 2), (1, 3, 1), (2, 3, 1)]
    thresh = sorted(map(tuple, bipartite_project(e, min_shared=2).collect()))
    assert thresh == [(1, 2)]
    with _pt.raises(ValueError):
        bipartite_project(e, min_shared=0)
