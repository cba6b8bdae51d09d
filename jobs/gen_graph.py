"""Generate a synthetic benchmark graph to parquet — the operational front
end of sources/rmat.py.

    python jobs/gen_graph.py --scale 20 --edge-factor 16 --output /tmp/g

Writes (edge_id, src, dst) parquet.  The generation plan is one narrow map
over range(m) (no shuffle, no driver state); with --lazy the un-checkpointed
plan streams straight into the parquet writer, so a petabyte-scale graph is
generated and written in a single pass without materializing twice (ANSI is
disabled for the write window and restored).  Deterministic: same
(scale, edge-factor, ppm, seed) → bit-identical files, any cluster size.
"""

from __future__ import annotations

import argparse
import json


def main(argv=None, stop: bool = True) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", type=int, required=True, help="2**scale vertices")
    ap.add_argument("--edge-factor", type=int, default=16)
    ap.add_argument("--a-ppm", type=int, default=570_000)
    ap.add_argument("--b-ppm", type=int, default=190_000)
    ap.add_argument("--c-ppm", type=int, default=190_000)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--output", required=True, help="parquet dir")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--lazy", action="store_true",
                    help="stream the plan into the writer (no checkpoint) — "
                         "the petabyte path")
    args = ap.parse_args(argv)

    from split_merge_partitioner_spark.session import get_spark
    from split_merge_partitioner_spark.sources import rmat_edges

    spark = get_spark(app_name="smp-gen-graph")
    try:
        kwargs = dict(
            scale=args.scale, edge_factor=args.edge_factor, a_ppm=args.a_ppm,
            b_ppm=args.b_ppm, c_ppm=args.c_ppm, seed=args.seed,
            num_partitions=args.partitions,
        )
        if args.lazy:
            ansi_was = spark.conf.get("spark.sql.ansi.enabled")
            spark.conf.set("spark.sql.ansi.enabled", "false")
            try:
                rmat_edges(spark, lazy=True, **kwargs).write.mode(
                    "overwrite"
                ).parquet(args.output)
            finally:
                spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        else:
            rmat_edges(spark, **kwargs).write.mode("overwrite").parquet(
                args.output
            )
        info = {
            "n_vertices": 1 << args.scale,
            "n_edges": args.edge_factor * (1 << args.scale),
            "seed": args.seed,
        }
        if args.json_out:
            with open(args.json_out, "w") as fh:
                json.dump(info, fh)
        print(json.dumps(info))
    finally:
        if stop:
            spark.stop()


if __name__ == "__main__":
    main()
