"""spinner_partition: exact Python replay of the derandomized synchronous
rounds, fixpoint early-stop equivalence, quality identities, determinism,
and the executor-storage leak guard (test_storage_release discipline)."""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest

from split_merge_partitioner_spark.functions.sampling import M31, _A1, _A2
from split_merge_partitioner_spark.operators.spinner import (
    spinner_partition,
    spinner_quality,
)
from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


def _sh(key: int, seed: int = 42) -> int:
    h = ((key % M31 + M31) % M31 + seed % M31 + 1) % M31
    h = (h * _A1) % M31
    return ((h + 1) * _A2) % M31


def _py_spinner(edge_list, k, rounds, seed=42):
    """Reference replay: pure function of (edges, k, rounds, seed), running
    the FULL round budget (no early stop)."""
    edges = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    adj: dict[int, set[int]] = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    verts = sorted(adj)
    n = len(verts)
    cap = (n + k - 1) // k
    cap_adm = cap + max(1, cap // 20)  # admission slack (spinner.py)
    lab = {v: _sh(v, seed) % k for v in verts}
    moves_hist = []
    for r in range(1, rounds + 1):
        load = Counter(lab.values())
        movers = []  # (gain, v, best) — capacity-admitted per label below
        for v in verts:
            deg = len(adj[v])
            nl = Counter(lab[nb] for nb in adj[v])
            cand = set(nl) | {lab[v]}

            def score(lbl):
                return nl.get(lbl, 0) * cap + deg * (cap - load[lbl])

            best = min(cand, key=lambda lbl: (-score(lbl), lbl))
            if (
                score(best) > score(lab[v])
                and (v + r) % 2 == 0
                and load[best] < cap_adm  # capacity gate (spinner.py)
            ):
                movers.append((score(best) - score(lab[v]), v, best))
        # deterministic remaining-capacity admission: per target label,
        # (gain DESC, v ASC), top cap - load(L) admitted (spinner.py)
        by_label: dict[int, list] = {}
        for gain, v, b in movers:
            by_label.setdefault(b, []).append((gain, v))
        new = dict(lab)
        moves = 0
        for b, lst in by_label.items():
            lst.sort(key=lambda gv: (-gv[0], gv[1]))
            for _, v in lst[: cap_adm - load[b]]:
                new[v] = b
                moves += 1
        lab = new
        moves_hist.append(moves)
    return lab, moves_hist, edges


GRAPHS = {
    "path": [(i, i + 1) for i in range(20)],
    "star": [(0, i) for i in range(1, 14)],
    "clique": [(i, j) for i in range(8) for j in range(i + 1, 8)],
    "two_cliques_bridge": [(i, j) for i in range(5) for j in range(i + 1, 5)]
    + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    + [(4, 10)],
    "messy": [(5, 4), (4, 5), (6, 6), (1, 2), (2, 3), (3, 1)],
    "powerlaw": None,
}


def _edge_list(name):
    el = GRAPHS[name]
    if el is None:
        pdf = powerlaw_edges_pdf(n=200, m_per_node=3)
        el = list(zip(pdf["src"].tolist(), pdf["dst"].tolist()))
    return el


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_spinner_exact_replay(spark, name):
    el = _edge_list(name)
    df = spark.createDataFrame(el, "src long, dst long")
    labels, info = spinner_partition(df, k=3, rounds=5)
    exp, moves, _ = _py_spinner(el, k=3, rounds=5)
    got = {r["vertex"]: r["label"] for r in labels.collect()}
    assert got == exp, name
    # moves trace matches for the rounds Spark actually ran
    assert info["moves"] == moves[: info["rounds_run"]]
    assert all(0 <= l < 3 for l in got.values())


def test_spinner_early_stop_is_fixpoint(spark):
    # generous budget: Spark early-stops after two dry rounds; the replay
    # runs all 40 rounds — equality validates the parity-fixpoint argument
    el = _edge_list("two_cliques_bridge")
    df = spark.createDataFrame(el, "src long, dst long")
    labels, info = spinner_partition(df, k=2, rounds=40)
    assert info["converged"]
    assert info["rounds_run"] < 40
    exp, _, _ = _py_spinner(el, k=2, rounds=40)
    got = {r["vertex"]: r["label"] for r in labels.collect()}
    assert got == exp


def test_spinner_quality_identities(spark):
    el = _edge_list("powerlaw")
    df = spark.createDataFrame(el, "src long, dst long")
    labels, info = spinner_partition(df, k=4, rounds=4)
    q = {r["label"]: r for r in spinner_quality(df, labels).collect()}
    exp, _, simple_edges = _py_spinner(el, k=4, rounds=4)
    m = len(simple_edges)
    n = len(exp)
    assert sum(r["n_vertices"] for r in q.values()) == n == info["n"]
    # each cut edge is counted once under each endpoint label
    assert sum(r["internal_edges"] for r in q.values()) + sum(
        r["cut_edges"] for r in q.values()
    ) // 2 == m
    # cross-check per-label counts against the replay labels
    internal = Counter()
    cut = Counter()
    for a, b in simple_edges:
        if exp[a] == exp[b]:
            internal[exp[a]] += 1
        else:
            cut[exp[a]] += 1
            cut[exp[b]] += 1
    for lbl, r in q.items():
        assert r["internal_edges"] == internal.get(lbl, 0)
        assert r["cut_edges"] == cut.get(lbl, 0)
        assert r["n_vertices"] == sum(1 for v in exp if exp[v] == lbl)


def test_spinner_partitioning_invariant(spark):
    el = _edge_list("powerlaw")
    a = spark.createDataFrame(el, "src long, dst long")
    b = a.repartition(7, "dst")
    la, _ = spinner_partition(a, k=3, rounds=3)
    lb, _ = spinner_partition(b, k=3, rounds=3)
    assert sorted(map(tuple, la.collect())) == sorted(map(tuple, lb.collect()))


def test_spinner_validations(spark):
    df = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        spinner_partition(df, k=1)
    with pytest.raises(ValueError):
        spinner_partition(df, k=2, rounds=0)


def test_spinner_releases_storage(spark):
    from split_merge_partitioner_spark.storage import release

    def stored():
        return {
            info.id() for info in spark.sparkContext._jsc.sc().getRDDStorageInfo()
        }

    el = _edge_list("path")
    df = spark.createDataFrame(el, "src long, dst long")
    before = stored()
    labels, _ = spinner_partition(df, k=2, rounds=4)
    labels.count()
    release(labels)
    leaked = stored() - before
    # at most the returned relation's own block may remain pinned pre-release;
    # after release nothing new should be live
    assert len(leaked) <= 1
