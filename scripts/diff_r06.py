#!/usr/bin/env python
"""Differential output check for round-6 execution optimizations.

Runs the declared entry queries whose execution paths were touched this
round and dumps each result (sorted, exact) to pickle; a second invocation
with --compare diffs two dump directories bit-for-bit.  This proves the
optimizations changed HOW the queries execute, not WHAT they compute
(the round contract: identical results for every declared query).

Usage:
  python scripts/diff_r06.py dump /tmp/diff_old [sf_dir]
  python scripts/diff_r06.py compare /tmp/diff_old /tmp/diff_new
"""

from __future__ import annotations

import os
import pickle
import sys

AFFECTED = [
    # fsm_partition internals (merge-stat fusion, joined-relation persist)
    "fsm_assign", "fsm_stats", "fsm_assign_portable", "fsm_stats_portable",
    # bucket_sizes / partition_stats single-pass aggregation
    "dbh_stats", "dbh_bucket_sizes", "hdrf_bucket_sizes",
    "ebv_bucket_sizes", "hybridbl_bucket_sizes", "partitioner_compare",
    # packed-RDD executors: single-partition superstep fusion
    "connected_components", "pagerank", "pagerank_10iter",
    "label_propagation", "label_propagation_warm", "modularity",
    "bfs_distances", "approx_diameter",
    "hyperanf_nf", "hyperanf_regs", "hyperanf_regs_cp",
    # louvain argmax restructure (window -> max_by)
    "louvain", "louvain_contract", "louvain2", "modularity_louvain",
    "louvain_cp", "conductance_louvain",
    # lazy-checkpoint conversions (star contraction, incremental CC,
    # robustness curves) + their consumers; agreement DECIMAL fix;
    # coreness_incremental init validation; dense-path Arrow materialization
    "connected_components_stars", "cc_incremental", "bond_percolation",
    "bond_percolation_cp", "attack_profile", "attack_profile_cp",
    "tri_percolation", "gn_split", "bridges", "two_edge_components",
    "biconn_bcc", "block_cut_tree", "articulation_points",
    "rcm_order", "gap_bits_orders", "coreness_incremental",
    "core_degree_agreement", "minhash_dedup_clusters", "edge_betweenness",
    "scan_roles", "salsa_auth", "salsa_auth_cp", "msf", "effective_diameter",
    # minhash signature-stage repartition
    "minhash_pairs", "minhash_dedup_clusters", "minhash_decontam",
    # session 2: driver-fused dense loops, persist-instead-of-checkpoint
    # setups (degrees/vertices), louvain driver degrees, minhash eager
    # signature materialization, oriented-relation persist
    "triangle_count", "triangles_per_vertex", "local_clustering",
    "global_clustering", "edge_support", "ktruss", "kclique4",
    "square_count", "triangle_delta", "triangle_count_sampled",
    "triangle_signif", "trussness",
]


def dump(outdir: str, sf_dir: str) -> None:
    os.makedirs(outdir, exist_ok=True)
    os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
    sys.path.insert(0, os.getcwd())
    import __spark_entry__ as entry
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(app_name="diff-r06")
    qd = entry.queries()
    for name in AFFECTED:
        if name not in qd:
            print(f"SKIP {name}: not in registry")
            continue
        df = qd[name](spark, sf_dir)
        pdf = df.toPandas()
        pdf = pdf.sort_values(list(pdf.columns)).reset_index(drop=True)
        with open(f"{outdir}/{name}.pkl", "wb") as f:
            pickle.dump(pdf, f)
        print(f"dumped {name}: {len(pdf)} rows")
    spark.stop()


def compare(a_dir: str, b_dir: str) -> int:
    import pandas as pd

    bad = 0
    for name in AFFECTED:
        pa, pb = f"{a_dir}/{name}.pkl", f"{b_dir}/{name}.pkl"
        if not (os.path.exists(pa) and os.path.exists(pb)):
            print(f"MISSING {name}")
            bad += 1
            continue
        with open(pa, "rb") as f:
            da = pickle.load(f)
        with open(pb, "rb") as f:
            db = pickle.load(f)
        try:
            pd.testing.assert_frame_equal(da, db, check_exact=True)
            print(f"OK {name} ({len(da)} rows)")
        except AssertionError as exc:
            print(f"DIFF {name}: {str(exc)[:300]}")
            bad += 1
    print(f"\n{'ALL IDENTICAL' if bad == 0 else f'{bad} DIFFS'}")
    return bad


if __name__ == "__main__":
    cmd = sys.argv[1]
    if cmd == "dump":
        dump(sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01")
    else:
        sys.exit(1 if compare(sys.argv[2], sys.argv[3]) else 0)
