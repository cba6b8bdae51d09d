#!/usr/bin/env python
"""Round-6 optimization profiling harness (guide §1: measure first).

NOT the driver's bench (bench.py is frozen): this file isolates each suite
query with per-phase timers and noop sinks, captures explain("formatted")
plans into plans/r06/, and prints one JSON line with per-phase seconds.

Usage:
  python bench_extra.py suite          # per-query wall clocks, 3 samples each
  python bench_extra.py fsm            # fsm_partition phase breakdown
  python bench_extra.py louvain        # per-round louvain timing
  python bench_extra.py plans          # capture explain("formatted") per query
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def get_session():
    from split_merge_partitioner_spark.session import get_spark

    return get_spark(app_name="smp-bench-extra", master=f"local[{os.environ['SPARK_GRAFT_CPUS']}]")


def t(fn):
    t0 = time.monotonic()
    r = fn()
    return round(time.monotonic() - t0, 3), r


def profile_fsm() -> dict:
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.operators import fsm_partition, partition_stats
    from split_merge_partitioner_spark.sources import edges_from_lineitem
    from split_merge_partitioner_spark.sources.edges import degrees as degrees_of

    spark = get_session()
    out: dict = {}
    out["edges_persist"], edges = t(
        lambda: edges_from_lineitem(spark, SF_DIR).persist()
    )
    out["edges_count"], m = t(edges.count)
    out["m"] = m

    # phase-by-phase replica of fsm_partition(p=32, k=2, merge=fast, hep_local)
    out["degrees_ckpt"], deg = t(
        lambda: degrees_of(edges).localCheckpoint(eager=True)
    )
    out["avg_agg"], row = t(
        lambda: deg.agg(F.avg("degree").alias("a"), F.sum("degree").alias("s")).collect()
    )
    # full pipeline timing for comparison
    t0 = time.monotonic()
    res = fsm_partition(edges, p=32, k=2, merge="fast", splitter="hep_local", deg=deg)
    assigned = res.assigned.persist()
    assigned.count()
    out["fsm_partition_total_given_deg"] = round(time.monotonic() - t0, 3)
    out["partition_stats"], _ = t(
        lambda: partition_stats(assigned, p=32).toPandas()
    )
    spark.stop()
    return out


def profile_louvain() -> dict:
    from split_merge_partitioner_spark.graph import louvain_local_move
    from split_merge_partitioner_spark.sources import edges_from_lineitem

    spark = get_session()
    edges = edges_from_lineitem(spark, SF_DIR).persist()
    edges.count()
    out: dict = {}
    for i in range(2):
        t0 = time.monotonic()
        _lv, info = louvain_local_move(edges, n_rounds=3)
        out[f"louvain_3rounds_run{i}"] = round(time.monotonic() - t0, 3)
        from split_merge_partitioner_spark.storage import release

        release(_lv)
    spark.stop()
    return out


def profile_suite(samples: int = 2) -> dict:
    """Per-query wall clock, interleaved best-of-N, one session (warm JVM)."""
    from pyspark.sql import functions as F

    from split_merge_partitioner_spark.functions import (
        ivf_knn,
        lsh_knn,
        minhash_near_duplicates,
    )
    from split_merge_partitioner_spark.graph import (
        approximate_diameter,
        connected_components,
        louvain_local_move,
        pagerank,
        triangle_count,
    )
    from split_merge_partitioner_spark.operators import fsm_partition, partition_stats
    from split_merge_partitioner_spark.sources import edges_from_lineitem
    from split_merge_partitioner_spark.storage import release

    spark = get_session()
    edges = edges_from_lineitem(spark, SF_DIR).persist()
    edges.count()
    res = fsm_partition(edges, p=32, k=2, merge="fast", splitter="hep_local")
    assigned = res.assigned.persist()
    assigned.count()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").persist()
    emb.count()

    def run_fsm():
        r = fsm_partition(edges, p=32, k=2, merge="fast", splitter="hep_local")
        r.assigned.persist().count()
        release(r.assigned)
        release(r.sub_assigned)

    def run_louvain():
        lv, _ = louvain_local_move(edges, n_rounds=3)
        release(lv)

    queries = {
        "fsm_partition": run_fsm,
        "partition_stats": lambda: partition_stats(assigned, p=32).toPandas(),
        "pagerank_20": lambda: pagerank(edges, assigned=assigned, mode="gas", tol=0.0, max_iter=20),
        "connected_components": lambda: connected_components(edges, assigned=assigned, mode="gas"),
        "triangle_count": lambda: triangle_count(edges),
        "louvain_3rounds": run_louvain,
        "approx_diameter": lambda: approximate_diameter(edges, assigned=assigned),
        "minhash_dedup": lambda: minhash_near_duplicates(docs, threshold=0.4).count(),
        "lsh_knn": lambda: lsh_knn(emb, k=5, n_planes=4, n_tables=6).count(),
        "ivf_knn": lambda: ivf_knn(emb, k=5).count(),
    }
    best: dict[str, float] = {}
    all_samples: dict[str, list] = {}
    for s in range(samples):
        for name, fn in queries.items():
            spark.sparkContext.setJobDescription(f"{name}[{s}]")
            sec, _ = t(fn)
            best[name] = min(best.get(name, 1e9), sec)
            all_samples.setdefault(name, []).append(sec)
    spark.stop()
    return {"queries_min": best, "queries_samples": all_samples, "samples": samples}


def capture_plans(out_dir: str = "plans/r06", suffix: str = "before") -> None:
    from split_merge_partitioner_spark.functions import (
        ivf_knn,
        lsh_knn,
        minhash_near_duplicates,
    )
    from split_merge_partitioner_spark.graph import louvain_local_move
    from split_merge_partitioner_spark.operators import fsm_partition, partition_stats
    from split_merge_partitioner_spark.sources import edges_from_lineitem

    os.makedirs(out_dir, exist_ok=True)
    spark = get_session()
    edges = edges_from_lineitem(spark, SF_DIR).persist()
    edges.count()
    res = fsm_partition(edges, p=32, k=2, merge="fast", splitter="hep_local")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    plans = {
        "edge_derivation": edges_from_lineitem(spark, SF_DIR),
        "fsm_assigned": res.assigned,
        "partition_stats": partition_stats(res.assigned.persist(), p=32),
        "minhash_dedup": minhash_near_duplicates(docs, threshold=0.4),
        "lsh_knn_candidates": None,  # checkpointed internally; skip
        "louvain_round": None,
    }
    lv, _ = louvain_local_move(edges, n_rounds=1)
    for name, df in plans.items():
        if df is None:
            continue
        with open(f"{out_dir}/{name}_{suffix}.txt", "w") as f:
            f.write(df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"))
    spark.stop()


def main():
    cmd = sys.argv[1] if len(sys.argv) > 1 else "suite"
    if cmd == "fsm":
        print(json.dumps(profile_fsm()))
    elif cmd == "louvain":
        print(json.dumps(profile_louvain()))
    elif cmd == "plans":
        capture_plans(suffix=sys.argv[2] if len(sys.argv) > 2 else "before")
    else:
        print(json.dumps(profile_suite()))


if __name__ == "__main__":
    main()
