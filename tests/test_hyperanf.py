"""HyperANF (graph/hyperanf.py): path agreement, accuracy vs the exact
neighborhood function, effective-diameter sanity, fixed-shape mode."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from split_merge_partitioner_spark.graph.hyperanf import (
    estimate_cardinalities,
    hyperanf,
    init_registers,
)
from split_merge_partitioner_spark.operators.expr_partitioners import dbh_partition


def _edges_df(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame({"src": [a for a, _ in pairs], "dst": [b for _, b in pairs]})
    )


def _exact_nf(pairs, n_steps):
    """Exact neighborhood function by dense BFS (oracle)."""
    verts = sorted({v for p in pairs for v in p})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    adj = np.zeros((n, n), dtype=bool)
    np.fill_diagonal(adj, True)
    for a, b in pairs:
        adj[idx[a], idx[b]] = adj[idx[b], idx[a]] = True
    reach = np.eye(n, dtype=bool)
    out = [float(n)]
    for _ in range(n_steps):
        reach = (reach[:, :, None] & adj[None, :, :]).any(axis=1) | reach
        out.append(float(reach.sum()))
    return out


def _two_cliques_bridge(k=40):
    pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
    pairs += [(100 + i, 100 + j) for i in range(k) for j in range(i + 1, k)]
    pairs += [(0, 100)]
    return pairs


def test_paths_agree_bit_exact(spark):
    rng = np.random.default_rng(7)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 60, size=(150, 2)) if a != b})
    e = _edges_df(spark, pairs).persist()
    nf_b, info_b = hyperanf(e, assigned=dbh_partition(e, 4), n_steps=16)
    nf_s, info_s = hyperanf(e, n_steps=16, broadcast_threshold=0, packed=False)
    nf_p, info_p = hyperanf(e, n_steps=16, broadcast_threshold=0, packed=True)
    assert info_b["mode"] == "broadcast" and info_s["mode"] == "shuffle"
    assert info_p["mode"] == "shuffle_packed"
    pb = nf_b.toPandas().sort_values("t").reset_index(drop=True)
    ps = nf_s.toPandas().sort_values("t").reset_index(drop=True)
    pp = nf_p.toPandas().sort_values("t").reset_index(drop=True)
    # registers are bit-identical on all three paths; estimates are the same
    # deterministic doubles (numpy vs JVM evaluate the identical formula)
    assert len(pb) == len(ps) == len(pp)
    np.testing.assert_allclose(pb["neighborhood"], ps["neighborhood"], rtol=1e-12)
    np.testing.assert_allclose(pb["neighborhood"], pp["neighborhood"], rtol=1e-12)
    assert abs(info_b["effective_diameter_90"] - info_s["effective_diameter_90"]) < 1e-9
    assert abs(info_b["effective_diameter_90"] - info_p["effective_diameter_90"]) < 1e-9


def test_packed_swar_max_matches_numpy():
    """The SWAR byte-lane max (guard-bit compare) against NumPy max over
    random register vectors, including lane values 0 and the 59 cap — packed
    state must reproduce the unpacked registers bit-for-bit."""
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.graph.hyperanf import (
        _pack_expr,
        _swar_max,
        _unpack_lane,
    )
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(master="local[2]", app_name="swar-test")
    rng = np.random.default_rng(3)
    a = rng.integers(0, 60, size=(50, 64)).astype(np.int32)
    b = rng.integers(0, 60, size=(50, 64)).astype(np.int32)
    a[0, :] = 0
    b[1, :] = 59
    pdf = pd.DataFrame({"ra": list(a), "rb": list(b)})
    df = spark.createDataFrame(pdf).select(
        F.zip_with(
            _pack_expr(F.col("ra")), _pack_expr(F.col("rb")), _swar_max
        ).alias("pk")
    )
    got = df.select(
        F.array(*[_unpack_lane(F.col("pk"), i) for i in range(64)]).alias("mx")
    ).toPandas()
    exp = np.maximum(a, b)
    got_m = np.stack(got["mx"].to_numpy())
    np.testing.assert_array_equal(got_m, exp)


def test_neighborhood_function_tracks_exact(spark):
    pairs = _two_cliques_bridge(40)
    e = _edges_df(spark, pairs).persist()
    nf, info = hyperanf(e, assigned=dbh_partition(e, 4), n_steps=8)
    got = nf.toPandas().sort_values("t")["neighborhood"].to_numpy()
    exact = np.array(_exact_nf(pairs, len(got) - 1))
    # m=64 registers -> ~13% relative std; allow 3 sigma
    np.testing.assert_allclose(got, exact, rtol=0.4)
    assert info["converged"]
    # monotone non-decreasing estimates (max-merge is monotone)
    assert (np.diff(got) >= -1e-9).all()


def test_effective_diameter_path_graph(spark):
    e = _edges_df(spark, [(i, i + 1) for i in range(29)]).persist()
    nf, info = hyperanf(e, assigned=dbh_partition(e, 4), n_steps=40)
    # 30-vertex path: true 90%-effective diameter is ~26 hops; the sketch
    # should land in the right regime, not at 3 and not at 40
    assert 15 <= info["effective_diameter_90"] <= 32
    assert info["converged"]


def test_fixed_steps_shape(spark):
    e = _edges_df(spark, [(0, 1), (1, 2)]).persist()
    for kwargs in ({"assigned": dbh_partition(e, 2)}, {"broadcast_threshold": 0}):
        nf, _ = hyperanf(e, n_steps=6, stop_early=False, **kwargs)
        pdf = nf.toPandas()
        assert len(pdf) == 7  # t = 0..6 even though the 3-path converges at 2
        assert list(pdf.sort_values("t")["t"]) == list(range(7))
        # converged tail is constant
        tail = pdf.sort_values("t")["neighborhood"].to_numpy()[2:]
        assert np.allclose(tail, tail[0])


def test_empty_graph(spark):
    e = spark.createDataFrame([], schema="src long, dst long")
    nf, info = hyperanf(e, n_steps=4)
    assert info["mode"] == "empty"
    assert nf.count() == 1


def test_estimator_accuracy_numpy():
    # pure-numpy: a merged sketch over k ids estimates k within 3 sigma
    for k in (5, 50, 500, 5000):
        regs = init_registers(np.arange(k, dtype=np.int64))
        merged = regs.max(axis=0, keepdims=True)
        est = estimate_cardinalities(merged)[0]
        assert abs(est - k) / k < 0.4, (k, est)
