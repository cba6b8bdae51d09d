#!/usr/bin/env python
"""Paper-shape comparison table (full.pdf Tables 3/4 analog): run every
edge-partitioning method at the same p on the same fixture and report
RF / s_V / s_E / sigma_V / sigma_E / wall-clock, plus the FSM variants.

Usage:
  python scripts/compare_methods.py [--p 32] [--out BENCH/METHODS.md]
          [--fixture powerlaw|zipf|sf0.1]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=32)
    ap.add_argument("--fixture", default="zipf", choices=["powerlaw", "zipf", "sf0.1"])
    ap.add_argument("--out", default="BENCH/METHODS.md")
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = ap.parse_args()

    from split_merge_partitioner_spark.operators import (
        dbh_partition,
        ebv_partition,
        fsm_partition,
        hdrf_partition,
        hep_partition,
        hybrid_partition,
        hybridbl_partition,
        ne_partition,
        partition_stats,
        validate_partition,
    )
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(master=f"local[{args.cpus}]", app_name="smp-compare")
    if args.fixture == "sf0.1":
        from split_merge_partitioner_spark.sources import edges_from_lineitem

        edges = edges_from_lineitem(spark, "/root/testdata/sf0.1")
        desc = "sf0.1 customer-supplier co-occurrence"
    elif args.fixture == "powerlaw":
        from split_merge_partitioner_spark.sources import powerlaw_edges_pdf

        edges = spark.createDataFrame(powerlaw_edges_pdf(n=50_000, m_per_node=8))
        desc = "powerlaw n=50k m=8 (seed 42)"
    else:
        from split_merge_partitioner_spark.sources import zipf_config_edges_pdf

        edges = spark.createDataFrame(zipf_config_edges_pdf(n=50_000, m=400_000))
        desc = "zipf-config n=50k m=400k alpha=0.7 (seed 2)"
    edges = edges.repartition(int(args.cpus)).localCheckpoint(eager=True)
    m = edges.count()

    p = args.p
    methods = {
        "dbh": lambda: dbh_partition(edges, p),
        "hybrid (PowerLyra)": lambda: hybrid_partition(edges, p),
        "hdrf (partition-local)": lambda: hdrf_partition(edges, p),
        "ebv (partition-local, blocked-256)": lambda: ebv_partition(edges, p),
        "ne (sequential)": lambda: ne_partition(edges, p),
        "hep (sequential, hdf=10)": lambda: hep_partition(edges, p, hdf=10.0),
        "hybridbl": lambda: hybridbl_partition(edges, p),
        "fsm ne_local k=2 fast": lambda: fsm_partition(
            edges, p, k=2, merge="fast", splitter="ne_local"
        ).assigned,
        "fsm hep_local k=2 fast": lambda: fsm_partition(
            edges, p, k=2, merge="fast", splitter="hep_local"
        ).assigned,
        "fsm hep_local k=2 precise": lambda: fsm_partition(
            edges, p, k=2, merge="precise", splitter="hep_local"
        ).assigned,
    }
    rows = []
    for name, fn in methods.items():
        t0 = time.monotonic()
        a = fn().localCheckpoint(eager=True)
        wall = time.monotonic() - t0
        viol = sum(validate_partition(edges, a, p).values())
        st = partition_stats(a, p=p).toPandas().iloc[0]
        rows.append(
            (name, st.rf, st.s_v, st.s_e, st.sigma_v, st.sigma_e, wall, viol)
        )
        print(rows[-1])

    lines = [
        "# METHODS — same-fixture comparison (full.pdf Tables 3/4 shape)",
        "",
        f"Fixture: {desc}; m = {m:,} edges; p = {p}; local[{args.cpus}].",
        "Wall-clock is a single sample on a high-variance VM — quality",
        "columns (RF, balance) are the stable comparison axis; see",
        "BENCH/BASELINE.md for the variance protocol.",
        "",
        "| method | RF | s_V | s_E | sigma_V | sigma_E | wall (s) | violations |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r[0]} | {r[1]:.3f} | {r[2]:.3f} | {r[3]:.3f} | {r[4]:.4f} "
            f"| {r[5]:.4f} | {r[6]:.1f} | {r[7]} |"
        )
    lines.append("")
    with open(args.out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.out}")
    spark.stop()


if __name__ == "__main__":
    main()
