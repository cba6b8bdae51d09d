"""trustrank / spam_mass (graph/dpagerank.py) vs a pure-Python replay plus
the TrustRank facts (mass conservation, unreachable-page zero trust,
whitelist spam mass ~0, validations)."""

from __future__ import annotations

import pytest

from split_merge_partitioner_spark.graph import spam_mass, trustrank


def _replay(pairs, trusted, n_iter, d=0.85):
    arcs = sorted({(a, b) for a, b in pairs})
    verts = sorted({v for e in arcs for v in e} | set(trusted))
    od = {}
    for a, _ in arcs:
        od[a] = od.get(a, 0) + 1
    t = {v: (1.0 / len(set(trusted)) if v in set(trusted) else 0.0) for v in verts}
    r = dict(t)
    for _ in range(n_iter):
        dang = sum(r[v] for v in verts if v not in od)
        inflow = {v: 0.0 for v in verts}
        for a, b in arcs:
            inflow[b] += r[a] / od[a]
        r = {
            v: (1 - d) * t[v] + (d * dang) * t[v] + d * inflow[v] for v in verts
        }
    return r


def _df(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_matches_python_replay(spark):
    pairs = [(v, (7 * v + 3) % 50) for v in range(50)] + [(10, 11), (11, 10)]
    got = {
        r.vertex: r.trust
        for r in trustrank(_df(spark, pairs), trusted=[0, 25], n_iter=5).collect()
    }
    want = _replay(pairs, [0, 25], 5)
    assert got.keys() == want.keys()
    assert all(abs(got[v] - want[v]) < 1e-12 for v in want)


def test_trust_conserved_and_unreachable_zero(spark):
    # two components; trust seeded only in the first: second stays at 0,
    # total mass stays 1 (dangling redistribution closes the leak)
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 10)]
    out = trustrank(_df(spark, pairs), trusted=[0], n_iter=6).collect()
    tm = {r.vertex: r.trust for r in out}
    assert tm[10] == 0.0 and tm[11] == 0.0
    assert abs(sum(tm.values()) - 1.0) < 1e-9


def test_spam_mass_separates_spam_farm(spark):
    # honest cluster around the trusted seed vs a spam farm that links only
    # to itself and to the target: the farm target's spam mass must dwarf
    # the whitelist neighborhood's
    honest = [(0, 1), (1, 2), (2, 0)]
    farm = [(100 + i, 99) for i in range(20)] + [(99, 100 + i) for i in range(20)]
    sm = {
        r.vertex: r.spam_mass
        for r in spam_mass(_df(spark, honest + farm), trusted=[0], n_iter=8).collect()
    }
    assert sm[99] > 0.9
    assert sm[1] < 0.2


def test_validations(spark):
    df = _df(spark, [(0, 1)])
    with pytest.raises(ValueError):
        trustrank(df, trusted=[])
    with pytest.raises(ValueError):
        trustrank(df, trusted=[0], n_iter=0)
    with pytest.raises(ValueError):
        trustrank(df, trusted=[0], damping=1.0)


def test_no_net_storage_growth(spark):
    sc = spark.sparkContext
    df = _df(spark, [(i, (i + 1) % 10) for i in range(10)])
    before = len(sc._jsc.sc().getRDDStorageInfo())
    spam_mass(df, trusted=[0], n_iter=3).collect()
    after = len(sc._jsc.sc().getRDDStorageInfo())
    assert after - before <= 1  # only the joined result
