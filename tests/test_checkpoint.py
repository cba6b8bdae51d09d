"""Resumability: a PageRank run killed mid-way resumes from the last complete
superstep and converges to the same fixpoint (north_rule F8)."""

from __future__ import annotations

import numpy as np
import pytest

from split_merge_partitioner_spark.checkpoint import CheckpointManager, config_hash
from split_merge_partitioner_spark.graph import pagerank
from split_merge_partitioner_spark.operators import fsm_partition
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf
from tests.oracles import pagerank_oracle


@pytest.fixture(scope="module")
def setup(spark, tmp_path_factory):
    pdf = powerlaw_edges_pdf(n=200, m_per_node=3)
    edges = spark.createDataFrame(pdf).persist()
    assigned = fsm_partition(edges, p=4, k=2, merge="fast", splitter="dbh").assigned.persist()
    assigned.count()
    base = str(tmp_path_factory.mktemp("ckpt"))
    return pdf, edges, assigned, base


def test_checkpoint_resume_same_result(spark, setup):
    pdf, edges, assigned, base = setup
    lineage = "edges@powerlaw-n200;" + config_hash({"p": 4, "k": 2, "splitter": "dbh"})

    # full run, 20 fixed iterations
    ck_full = CheckpointManager(base, "full", lineage)
    ranks_full, _ = pagerank(
        edges, assigned=assigned, mode="gas", tol=0.0, max_iter=20, ckpt=ck_full
    )
    full = ranks_full.toPandas().sort_values("vertex")["rank"].to_numpy()

    # interrupted run: stop after 10 supersteps ...
    ck = CheckpointManager(base, "resumable", lineage)
    pagerank(edges, assigned=assigned, mode="gas", tol=0.0, max_iter=10, ckpt=ck)
    assert ck.latest_superstep() == 9
    # ... resume to 20 — must equal the uninterrupted run exactly
    ranks_res, info = pagerank(
        edges, assigned=assigned, mode="gas", tol=0.0, max_iter=20, ckpt=ck, resume=True
    )
    assert info["iterations"] == 20
    res = ranks_res.toPandas().sort_values("vertex")["rank"].to_numpy()
    np.testing.assert_allclose(res, full, atol=1e-12)

    # and matches the oracle at the same superstep count
    oracle = pagerank_oracle(pdf, tol=-1.0, max_iter=20)["rank"].to_numpy()
    np.testing.assert_allclose(res, oracle, atol=1e-12)

    # F8 metric rows: per-partition lineage + throughput recorded
    met = ck.metrics(spark).toPandas()
    assert set(met.columns) == {
        "run_id", "superstep", "partition_id", "n_edges", "n_replicas",
        "delta_max", "edges_per_sec", "lineage",
    }
    assert (met.lineage == lineage).all()
    assert met.partition_id.nunique() == 4
    assert (met.edges_per_sec > 0).all()
