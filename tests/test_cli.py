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
