"""Round-6 executor-path parity: the fused single-task loops and the
multi-task block-RDD loops must produce identical results.

The sf fixtures all fall under the fusion gates, so these tests force the
multi-task routes by shrinking the gates and compare against the fused
results (and the plain-Catalyst references where available)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

import importlib

# the package re-exports functions under the same names, so attribute-style
# module imports would resolve to the functions — go through sys.modules
louvain_mod = importlib.import_module("split_merge_partitioner_spark.graph.louvain")
pagerank_mod = importlib.import_module("split_merge_partitioner_spark.graph.pagerank")
from split_merge_partitioner_spark.graph import (
    connected_components,
    hyperanf,
    label_propagation,
    louvain_local_move,
    pagerank,
)
from split_merge_partitioner_spark.operators import dbh_partition
from split_merge_partitioner_spark.storage import release


@pytest.fixture(scope="module")
def graph(spark):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 300, 1500)
    dst = rng.integers(0, 300, 1500)
    pdf = pd.DataFrame({"src": np.minimum(src, dst), "dst": np.maximum(src, dst)})
    pdf = pdf[pdf.src != pdf.dst].drop_duplicates()
    edges = spark.createDataFrame(pdf).localCheckpoint(eager=True)
    assigned = dbh_partition(edges, 8).localCheckpoint(eager=True)
    yield edges, assigned
    release(edges)
    release(assigned)


def _rows(df, cols):
    return sorted(map(tuple, df.select(*cols).collect()))


def test_cc_multitask_matches_fused(graph, monkeypatch):
    edges, assigned = graph
    fused, fi = connected_components(edges, assigned=assigned, mode="gas")
    want = _rows(fused, ["vertex", "component"])
    monkeypatch.setattr(pagerank_mod, "EDGES_PER_TASK", 1)
    multi, mi = connected_components(edges, assigned=assigned, mode="gas")
    assert _rows(multi, ["vertex", "component"]) == want
    assert mi["converged"]


def test_pagerank_multitask_matches_fused(graph, monkeypatch):
    edges, assigned = graph
    fused, _ = pagerank(edges, assigned=assigned, mode="gas", tol=0.0, max_iter=8)
    want = {r["vertex"]: r["rank"] for r in fused.collect()}
    monkeypatch.setattr(pagerank_mod, "EDGES_PER_TASK", 1)
    multi, _ = pagerank(edges, assigned=assigned, mode="gas", tol=0.0, max_iter=8)
    got = {r["vertex"]: r["rank"] for r in multi.collect()}
    assert got.keys() == want.keys()
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-12)


def test_labelprop_multitask_matches_fused(graph, monkeypatch):
    edges, assigned = graph
    fused = label_propagation(edges, assigned=assigned, n_iter=4)
    want = _rows(fused, ["vertex", "label"])
    monkeypatch.setattr(pagerank_mod, "EDGES_PER_TASK", 1)
    multi = label_propagation(edges, assigned=assigned, n_iter=4)
    assert _rows(multi, ["vertex", "label"]) == want


def test_hyperanf_multitask_matches_fused(graph, monkeypatch):
    edges, assigned = graph
    df_fused, i_fused = hyperanf(edges, assigned=assigned, n_steps=3, stop_early=False)
    want = _rows(df_fused, ["t", "neighborhood"])
    monkeypatch.setattr(pagerank_mod, "EDGES_PER_TASK", 1)
    df_multi, i_multi = hyperanf(edges, assigned=assigned, n_steps=3, stop_early=False)
    assert i_multi["iterations"] == i_fused["iterations"]
    assert _rows(df_multi, ["t", "neighborhood"]) == want


def test_louvain_distributed_matches_dense(graph, monkeypatch):
    edges, _ = graph
    dense, di = louvain_local_move(edges, n_rounds=3)
    want = _rows(dense, ["vertex", "comm"])
    release(dense)
    monkeypatch.setattr(louvain_mod, "DENSE_EDGE_THRESHOLD", 0)
    dist, si = louvain_local_move(edges, n_rounds=3)
    assert _rows(dist, ["vertex", "comm"]) == want
    assert si["moves"] == di["moves"]
    assert si["n_communities"] == di["n_communities"]
    release(dist)
