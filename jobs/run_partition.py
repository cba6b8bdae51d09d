#!/usr/bin/env python
"""spark-submit entry point: partition an edge table and write the sink.

Knob names mirror the reference CLI (gflags surface, src/main.cpp:20-35):
  --p            number of final partitions        (-p)
  --k            split multiplier for FSM          (-k)
  --method       fsm | dbh | hybrid | hdrf | ebv | ne | hep | fennel | hybridbl | bpart | spinner | multilevel | v2e | v2e_metis  (-method)
  --fastmerge    use fast_merge instead of precise (-fastmerge)
  --hdf          high-degree factor                (-hdf)
  --lambda_      HDRF balance lambda               (-lambda)
  --write        none | onefile | multifile        (-write)
  --splitter     FSM split strategy: ne_local | hep_local | dbh
  --ne_mode      NE/HEP baseline mode: sequential | grouped

Usage:
  spark-submit --py-files engine.zip jobs/run_partition.py \
      --input /data/edges.parquet --output /data/parts --method fsm --p 32 --k 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/run_*.py` invocation: put the repo root on sys.path
# (spark-submit --py-files provides the package on executors either way)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None, stop: bool = True) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="edge parquet (src, dst)")
    ap.add_argument("--output", default=None)
    ap.add_argument("--p", type=int, default=32)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--method", default="fsm",
                    choices=["fsm", "dbh", "hybrid", "hdrf", "ebv", "ne", "hep",
                             "fennel", "hybridbl", "bpart", "spinner", "multilevel", "v2e",
                             "v2e_metis"])
    ap.add_argument("--fastmerge", action="store_true")
    ap.add_argument("--hdf", type=float, default=100.0)
    ap.add_argument("--lambda_", "--lambda", type=float, default=1.1, dest="lambda_")
    ap.add_argument("--write", default="none", choices=["none", "onefile", "multifile"])
    ap.add_argument("--splitter", default="ne_local",
                    choices=["ne_local", "hep_local", "dbh"])
    ap.add_argument("--ne_mode", default="sequential", choices=["sequential", "grouped"])
    # reference -write_low_degree_edgelist (src/main.cpp:30): spill the edges
    # incident to a low-degree vertex next to the sink.  The reference's
    # -random_streaming and -hybrid_NE flags are declared but never consumed
    # in its code (hep_partitioner.hpp:276 is commented out; FLAGS_hybrid_NE
    # has no use site) — documented out of scope in COVERAGE.md.
    ap.add_argument("--write_low_degree_edgelist", action="store_true")
    # v2e_metis: gpmetis output file (<graph>.part.<p>) — line i = bucket of
    # dense vertex i-1 (the reference pipeline README.md:63-70, reader parity
    # src/vertex2edgepart.cpp:40-59)
    ap.add_argument("--vertex_parts", default=None,
                    help="METIS .part.<p> file for --method v2e_metis")
    args = ap.parse_args(argv)

    from split_merge_partitioner_spark.operators import (
        dbh_partition,
        ebv_partition,
        fsm_partition,
        hdrf_partition,
        hybrid_partition,
        partition_stats,
        validate_partition,
        vertex2edge_partition,
        vertex_partition_by_hash,
    )
    from split_merge_partitioner_spark.session import get_spark
    from split_merge_partitioner_spark.sources.writers import (
        write_edgepart_multifile,
        write_edgepart_onefile,
    )

    spark = get_spark(app_name=f"smp-{args.method}-p{args.p}")
    edges = spark.read.parquet(args.input).localCheckpoint(eager=True)

    if args.method == "fsm":
        res = fsm_partition(
            edges, p=args.p, k=args.k,
            merge="fast" if args.fastmerge else "precise",
            splitter=args.splitter, hdf=args.hdf,
        )
        assigned = res.assigned
    elif args.method == "dbh":
        assigned = dbh_partition(edges, args.p)
    elif args.method == "hybrid":
        assigned = hybrid_partition(edges, args.p)
    elif args.method == "hdrf":
        assigned = hdrf_partition(edges, args.p, lam=args.lambda_)
    elif args.method == "ebv":
        assigned = ebv_partition(edges, args.p)
    elif args.method == "ne":
        from split_merge_partitioner_spark.operators import ne_partition

        assigned = ne_partition(edges, args.p, mode=args.ne_mode)
    elif args.method == "hep":
        from split_merge_partitioner_spark.operators import hep_partition

        assigned = hep_partition(edges, args.p, hdf=args.hdf, mode=args.ne_mode)
    elif args.method == "fennel":
        # Fennel is a VERTEX partitioner; convert to an edge partition the
        # v2e way for a uniform sink (document: stats differ from A2's)
        from split_merge_partitioner_spark.operators import fennel_partition

        assigned = vertex2edge_partition(edges, fennel_partition(edges, args.p))
    elif args.method == "hybridbl":
        from split_merge_partitioner_spark.operators import hybridbl_partition

        assigned = hybridbl_partition(edges, args.p)
    elif args.method == "bpart":
        # BPart is a VERTEX partitioner; same v2e conversion as fennel
        from split_merge_partitioner_spark.operators import bpart_partition

        assigned = vertex2edge_partition(edges, bpart_partition(edges, args.p))
    elif args.method == "spinner":
        # Spinner LP vertex partitioner (ICDE'17) — the in-engine producer
        # of the vertex partition the v2e pipeline otherwise imports from
        # gpmetis; same v2e conversion as fennel/bpart
        from split_merge_partitioner_spark.operators.spinner import (
            spinner_partition,
        )

        vlabels, _ = spinner_partition(edges, k=args.p)
        assigned = vertex2edge_partition(
            edges, vlabels.withColumnRenamed("label", "bucket")
        )
    elif args.method == "multilevel":
        # METIS-style multilevel (coarsen -> Spinner -> project), the
        # higher-quality in-engine v2e producer
        from split_merge_partitioner_spark.operators import multilevel_partition

        vlabels, _ = multilevel_partition(edges, k=args.p)
        assigned = vertex2edge_partition(
            edges, vlabels.withColumnRenamed("label", "bucket")
        )
    elif args.method == "v2e_metis":
        # the reference's documented three-step pipeline: adjlist export ->
        # external gpmetis -> read .part.<p> -> edge assignment
        from split_merge_partitioner_spark.sources.writers import (
            read_metis_vertexparts,
        )

        assert args.vertex_parts, "--vertex_parts required with v2e_metis"
        vp = read_metis_vertexparts(spark, args.vertex_parts, p=args.p)
        assigned = vertex2edge_partition(edges, vp)
    else:  # v2e
        assigned = vertex2edge_partition(edges, vertex_partition_by_hash(edges, args.p))

    assigned = assigned.localCheckpoint(eager=True)
    violations = validate_partition(edges, assigned, args.p)
    stats = partition_stats(assigned, p=args.p).toPandas().iloc[0].to_dict()
    print(json.dumps({"method": args.method, "p": args.p,
                      "violations": violations,
                      "stats": {k: round(float(v), 6) for k, v in stats.items()}}))
    if any(violations.values()):
        sys.exit(2)
    if args.write_low_degree_edgelist:
        assert args.output, "--output required with --write_low_degree_edgelist"
        from split_merge_partitioner_spark.sources.writers import (
            write_low_degree_edgelist,
        )

        n_low = write_low_degree_edgelist(
            edges, f"{args.output}.low_edgelist.parquet", hdf=args.hdf
        )
        print(json.dumps({"low_degree_edges_written": n_low}))
    if args.write != "none":
        assert args.output, "--output required with --write"
        if args.write == "multifile":
            write_edgepart_multifile(assigned, args.output)
        else:
            write_edgepart_onefile(assigned, args.output)
    if stop:  # keep the session when embedded (tests reuse one session)
        spark.stop()


if __name__ == "__main__":
    main()
