"""Unit tests: ppr_sweep_cut (graph/sweep.py) — the ACL sweep must carve
out a planted community, and the integer bookkeeping must be exact."""

from __future__ import annotations

import itertools

import pytest

from split_merge_partitioner_spark.graph import ppr_sweep_cut


def _two_cliques(spark, a=6, b=6):
    # clique A on 0..a-1, clique B on 100..100+b-1, one bridge 0-100
    edges = list(itertools.combinations(range(a), 2))
    edges += list(itertools.combinations(range(100, 100 + b), 2))
    edges.append((0, 100))
    return spark.createDataFrame(
        [(min(u, v), max(u, v)) for u, v in edges], "src long, dst long"
    )


def test_sweep_finds_planted_clique(spark):
    e = _two_cliques(spark)
    out = sorted(
        ppr_sweep_cut(e, seeds=[1, 2], k_max=12).collect(), key=lambda r: r["k"]
    )
    best = min(out, key=lambda r: (r["conductance_ppm"], r["k"]))
    assert best["k"] == 6  # the seed clique
    prefix = {r["vertex"] for r in out[:6]}
    assert prefix == {0, 1, 2, 3, 4, 5}
    # hand-check the k=6 row: clique A vol = 5*5 + 6 (bridge on vertex 0),
    # cut = the single bridge edge
    k6 = out[5]
    assert k6["vol"] == 5 * 6 + 1 and k6["cut"] == 1
    assert k6["conductance_ppm"] == 1000000 * 1 // 31


def test_sweep_prefix_invariants(spark):
    e = _two_cliques(spark, a=5, b=7)
    out = sorted(
        ppr_sweep_cut(e, seeds=[101], k_max=13).collect(), key=lambda r: r["k"]
    )
    # ranks are 1..k dense; vol strictly increases; cut >= 0
    assert [r["k"] for r in out] == list(range(1, len(out) + 1))
    vols = [r["vol"] for r in out]
    assert all(b > a for a, b in zip(vols, vols[1:]))
    assert all(r["cut"] >= 0 for r in out)
    # the degenerate whole-graph prefix (vol = 2m, conductance 0/0) is
    # excluded: 12 vertices total -> 11 proper prefixes
    m = 10 + 21 + 1
    assert len(out) == 11
    assert all(r["vol"] < 2 * m for r in out)
    # the last proper prefix cuts exactly the missing vertex's degree
    assert out[-1]["cut"] > 0


def test_sweep_rejects_bad_k(spark):
    e = _two_cliques(spark)
    with pytest.raises(ValueError):
        ppr_sweep_cut(e, seeds=[0], k_max=0)
