#!/usr/bin/env python
"""spark-submit entry point: FSM-partitioned PageRank with checkpoint/resume.

Usage:
  spark-submit --py-files engine.zip jobs/run_pagerank.py \
      --input /data/edges.parquet --p 32 --k 2 --tol 1e-6 \
      --checkpoint-dir /data/ckpt --run-id pr-2026-08 [--resume]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# direct `python jobs/run_*.py` invocation: put the repo root on sys.path
# (spark-submit --py-files provides the package on executors either way)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", default=None, help="ranks parquet")
    ap.add_argument("--p", type=int, default=32)
    ap.add_argument("--k", type=int, default=2)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--max-iter", type=int, default=200)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--run-id", default="pagerank-run")
    ap.add_argument("--resume", action="store_true")
    args = ap.parse_args(argv)

    from split_merge_partitioner_spark.checkpoint import CheckpointManager, config_hash
    from split_merge_partitioner_spark.graph import pagerank
    from split_merge_partitioner_spark.operators import fsm_partition
    from split_merge_partitioner_spark.session import get_spark

    spark = get_spark(app_name=f"smp-pagerank-{args.run_id}")
    edges = spark.read.parquet(args.input).localCheckpoint(eager=True)
    res = fsm_partition(edges, p=args.p, k=args.k, merge="fast", splitter="ne_local")
    assigned = res.assigned.localCheckpoint(eager=True)

    ckpt = None
    if args.checkpoint_dir:
        lineage = f"{args.input};" + config_hash(
            {"p": args.p, "k": args.k, "tol": args.tol}
        )
        ckpt = CheckpointManager(args.checkpoint_dir, args.run_id, lineage)

    ranks, info = pagerank(
        edges, assigned=assigned, mode="gas",
        tol=args.tol, max_iter=args.max_iter, ckpt=ckpt, resume=args.resume,
    )
    if args.output:
        ranks.write.mode("overwrite").parquet(args.output)
    print(json.dumps(info))
    spark.stop()


if __name__ == "__main__":
    main()
