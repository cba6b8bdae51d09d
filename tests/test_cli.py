"""End-to-end CLI surface: jobs/run_partition.py main() over a parquet edge
table — validation gate, stats JSON line, sink writing."""

from __future__ import annotations

import json
import sys

import pytest

from split_merge_partitioner_spark.sources import powerlaw_edges_pdf


@pytest.fixture(scope="module")
def edges_parquet(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("cli") / "edges.parquet")
    spark.createDataFrame(powerlaw_edges_pdf(n=300, m_per_node=4)).write.parquet(path)
    return path


@pytest.mark.parametrize(
    "argv_extra",
    [
        ["--method", "fsm", "--k", "2", "--splitter", "hep_local", "--fastmerge"],
        ["--method", "ne"],
        ["--method", "hep", "--hdf", "10"],
        ["--method", "hybridbl"],
        ["--method", "bpart"],
        ["--method", "spinner"],
        ["--method", "multilevel"],
    ],
)
def test_run_partition_cli(spark, edges_parquet, tmp_path, capsys, argv_extra):
    sys.path.insert(0, "jobs")
    import run_partition

    out_dir = str(tmp_path / "parts")
    run_partition.main(
        ["--input", edges_parquet, "--p", "4", "--write", "multifile",
         "--output", out_dir] + argv_extra,
        stop=False,
    )
    line = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert all(v == 0 for v in rec["violations"].values()), rec
    assert rec["stats"]["rf"] >= 1.0
    # sink re-verification (get_stat pattern): written rows == m
    back = spark.read.parquet(out_dir)
    assert back.count() == spark.read.parquet(edges_parquet).count()


def test_write_low_degree_edgelist(spark, edges_parquet, tmp_path, capsys):
    """Reference -write_low_degree_edgelist (src/main.cpp:30): the spill file
    holds exactly the edges with at least one low-degree endpoint."""
    import run_partition

    out_dir = str(tmp_path / "parts")
    run_partition.main(
        ["--input", edges_parquet, "--p", "4", "--method", "dbh",
         "--hdf", "2", "--output", out_dir, "--write_low_degree_edgelist"],
        stop=False,
    )
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")]
    rec = next(json.loads(ln) for ln in lines if "low_degree_edges_written" in ln)
    low = spark.read.parquet(f"{out_dir}.low_edgelist.parquet")
    assert low.count() == rec["low_degree_edges_written"] > 0
    # oracle: recompute the threshold rule on the driver
    e = spark.read.parquet(edges_parquet).toPandas()
    import pandas as pd
    deg = pd.concat([e.src, e.dst]).value_counts()
    thresh = 2 * deg.mean()
    expect = e[(deg[e.src].values <= thresh) | (deg[e.dst].values <= thresh)]
    assert low.count() == len(expect)


def test_build_pyfiles_zip_importable(tmp_path):
    """scripts/build_pyfiles.sh produces a --py-files artifact that imports
    the way executors consume it (zip directly on sys.path)."""
    import subprocess

    out = tmp_path / "engine.zip"
    subprocess.run(
        ["bash", "scripts/build_pyfiles.sh", str(out)], check=True, capture_output=True
    )
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import split_merge_partitioner_spark as p; "
        "from split_merge_partitioner_spark.graph import hyperanf; "
        "assert 'engine.zip' in p.__file__, p.__file__"
    ) % str(out)
    subprocess.run([sys.executable, "-c", code], check=True, capture_output=True)


@pytest.mark.parametrize("algo,extra", [
    ("cc", []),
    ("cc", ["--cc-algo", "stars"]),
    ("kcore", []),
    ("hyperanf", ["--n-steps", "4"]),
    ("tricount", []),
    ("clustering", []),
    ("linkpred", []),
    ("bfs", ["--source", "0"]),
    ("walks", ["--walk-length", "4", "--walks-per-vertex", "1"]),
    ("ppr", ["--seeds", "0,1"]),
    ("betweenness", ["--seeds", "0"]),
    ("closeness", ["--seeds", "0,1", "--max-dist", "6"]),
    ("summary", []),
    ("eigen", ["--n-power-iter", "4"]),
    ("hits", ["--n-rounds", "2"]),
    ("scc", []),
    ("densest", ["--peel-rounds", "3"]),
    ("wpagerank", ["--n-iter", "3"]),
    ("mis", []),
    ("matching", []),
    ("dpagerank", ["--n-iter", "3"]),
    ("sssp", ["--source", "0", "--max-supersteps", "6"]),
    ("widest", ["--source", "0", "--max-supersteps", "6"]),
    ("modularity", ["--n-iter", "3"]),
    ("ktruss", ["--k-truss", "3"]),
    ("coloring", []),
    ("butterfly", []),
    ("nsample", ["--fanouts", "2,2", "--seed-fraction", "0.3"]),
    ("louvain", ["--n-iter", "2"]),
    ("node2vec", ["--walk-length", "3", "--bias", "1,2,4"]),
    ("richclub", []),
    ("katz", ["--n-power-iter", "4"]),
    ("daglevels", []),
    ("salsa", []),
    ("kclique", ["--k", "3"]),
    ("squares", []),
    ("gini", []),
    ("compsizes", []),
    ("onion", []),
    ("trussness", []),
    ("census", []),
    ("spectral", []),
    ("sweep", ["--seeds", "0"]),
    ("wl", ["--n-rounds", "2"]),
    ("msf", []),
    ("bridges", []),
    ("twoecc", []),
    ("bicc", []),
    ("articulation", []),
    ("rcm", []),
    ("gapbits", []),
    ("orbits", []),
    ("rewire", ["--seed", "3"]),
    ("fingerprint", ["--max-iter", "2"]),
])
def test_run_analytics_cli(spark, edges_parquet, tmp_path, capsys, algo, extra):
    from jobs.run_analytics import main as analytics_main

    out = str(tmp_path / f"{algo}.parquet")
    jinfo = str(tmp_path / f"{algo}.json")
    analytics_main(["--input", edges_parquet, "--algo", algo,
                    "--p", "4", "--output", out, "--json-out", jinfo, *extra],
                   stop=False)
    import pandas as pd_  # local alias; pandas may not be imported here

    res = pd_.read_parquet(out)
    assert len(res) > 0
    info = json.loads(open(jinfo).read())
    assert isinstance(info, dict)


def test_run_analytics_abcore_cli(spark, tmp_path, tmp_path_factory):
    """abcore needs a bipartite input (the powerlaw CLI fixture would fail
    its disjointness validation, by design) — K_{4,5} minus a corner."""
    from jobs.run_analytics import main as analytics_main

    path = str(tmp_path_factory.mktemp("cli_bip") / "bip.parquet")
    pairs = [(i, 1000 + j) for i in range(4) for j in range(5)][:-1]
    spark.createDataFrame(pairs, "src long, dst long").write.parquet(path)
    out = str(tmp_path / "abcore.parquet")
    analytics_main(["--input", path, "--algo", "abcore",
                    "--alpha", "5", "--beta", "4", "--output", out], stop=False)
    import pandas as pd_

    got = pd_.read_parquet(out)
    # the missing corner drops vertex 3 and col 1004, leaving K_{3,4}... but
    # alpha=5 > 4 available cols for rows 0-2 after the cascade: verify the
    # peel result is exactly the brute-force fixpoint (empty here)
    assert len(got) == 0


def test_run_analytics_twins_cli(spark, tmp_path, tmp_path_factory):
    """--algo twins finds the star's leaf class; --closed finds none."""
    from jobs.run_analytics import main as analytics_main

    path = str(tmp_path_factory.mktemp("cli_twins") / "star.parquet")
    spark.createDataFrame(
        [(0, i) for i in range(1, 5)], "src long, dst long"
    ).write.parquet(path)
    out = str(tmp_path / "twins.parquet")
    analytics_main(["--input", path, "--algo", "twins", "--output", out],
                   stop=False)
    import pandas as pd_

    got = pd_.read_parquet(out)
    assert sorted(got["vertex"]) == [1, 2, 3, 4]
    assert set(got["twin_id"]) == {1} and set(got["twin_size"]) == {4}
    out2 = str(tmp_path / "twins_closed.parquet")
    analytics_main(["--input", path, "--algo", "twins", "--closed",
                    "--output", out2], stop=False)
    assert len(pd_.read_parquet(out2)) == 0


def test_run_analytics_landmarks_cli(spark, tmp_path, tmp_path_factory):
    """--algo landmarks sketches BFS distances from --k top-degree hubs."""
    from jobs.run_analytics import main as analytics_main

    path = str(tmp_path_factory.mktemp("cli_lm") / "chain.parquet")
    spark.createDataFrame(
        [(i, i + 1) for i in range(6)] + [(0, 9)], "src long, dst long"
    ).write.parquet(path)
    out = str(tmp_path / "sketch.parquet")
    analytics_main(["--input", path, "--algo", "landmarks", "--k", "1",
                    "--max-dist", "3", "--output", out], stop=False)
    import pandas as pd_

    got = pd_.read_parquet(out)
    # degree-2 tie among {0..5} breaks to the smallest id: landmark = 0,
    # which reaches {0,1,2,3,9} within 3 hops
    assert set(got["landmark"]) == {0}
    assert sorted(got["vertex"]) == [0, 1, 2, 3, 9]
    assert (got["dist"] <= 3).all() and (got["dist"] >= 0).all()


def test_run_analytics_incremental_cc_cli(spark, tmp_path, tmp_path_factory):
    """--labels-input + --delta-input routes cc to the incremental merge and
    the result equals recomputing over base ∪ delta."""
    from jobs.run_analytics import main as analytics_main
    from split_merge_partitioner_spark.graph import connected_components_stars

    d = tmp_path_factory.mktemp("cli_inc")
    base = [(0, 1), (1, 2), (10, 11), (20, 21)]
    delta = [(2, 10), (30, 31)]
    spark.createDataFrame(base, "src long, dst long").write.parquet(str(d / "base.parquet"))
    spark.createDataFrame(delta, "src long, dst long").write.parquet(str(d / "delta.parquet"))
    lab, _ = connected_components_stars(
        spark.read.parquet(str(d / "base.parquet"))
    )
    lab.write.parquet(str(d / "labels.parquet"))
    out = str(tmp_path / "cc_inc.parquet")
    analytics_main(["--input", str(d / "delta.parquet"), "--algo", "cc",
                    "--labels-input", str(d / "labels.parquet"),
                    "--delta-input", str(d / "delta.parquet"),
                    "--no-partition", "--output", out], stop=False)
    import pandas as pd_

    got = {(r.vertex, r.component) for r in pd_.read_parquet(out).itertuples()}
    full, _ = connected_components_stars(
        spark.createDataFrame(base + delta, "src long, dst long")
    )
    assert got == {(r.vertex, r.component) for r in full.collect()}


def test_run_analytics_no_partition_cc(spark, edges_parquet, tmp_path):
    """--no-partition must route cc/lp to the join mode, not crash on the
    gas-mode assigned assertion."""
    from jobs.run_analytics import main as analytics_main

    out = str(tmp_path / "cc_np.parquet")
    analytics_main(["--input", edges_parquet, "--algo", "cc",
                    "--no-partition", "--output", out], stop=False)
    import pandas as pd_

    assert len(pd_.read_parquet(out)) > 0


def test_run_analytics_cascade_and_spammass_cli(spark, tmp_path, tmp_path_factory):
    """--algo cascade / spammass route with explicit seeds."""
    from jobs.run_analytics import main as analytics_main

    path = str(tmp_path_factory.mktemp("cli_casc") / "g.parquet")
    spark.createDataFrame(
        [(v, (3 * v + 1) % 20) for v in range(20)], "src long, dst long"
    ).write.parquet(path)
    out = str(tmp_path / "casc.parquet")
    analytics_main(["--input", path, "--algo", "cascade", "--seeds", "0,1",
                    "--p-ppm", "1000000", "--n-sims", "2", "--output", out],
                   stop=False)
    import pandas as pd_

    got = pd_.read_parquet(out)
    # p = 1: both sims reach the full forward closure — identical counts
    assert len(got) == 2 and got["n_influenced"].nunique() == 1
    out2 = str(tmp_path / "sm.parquet")
    analytics_main(["--input", path, "--algo", "spammass", "--seeds", "0",
                    "--n-iter", "4", "--output", out2], stop=False)
    sm = pd_.read_parquet(out2)
    assert len(sm) == 20 and {"rank", "trust", "spam_mass"} <= set(sm.columns)


def test_gen_graph_cli(spark, tmp_path):
    """jobs/gen_graph.py writes the deterministic R-MAT parquet; lazy and
    eager paths produce identical edges."""
    from jobs.gen_graph import main as gen_main

    o1, o2 = str(tmp_path / "g1"), str(tmp_path / "g2")
    gen_main(["--scale", "6", "--edge-factor", "4", "--output", o1],
             stop=False)
    gen_main(["--scale", "6", "--edge-factor", "4", "--output", o2, "--lazy"],
             stop=False)
    import pandas as pd_

    a = pd_.read_parquet(o1).sort_values("edge_id").reset_index(drop=True)
    b = pd_.read_parquet(o2).sort_values("edge_id").reset_index(drop=True)
    assert len(a) == 256 and a.equals(b)
