#!/usr/bin/env python
"""Per-job profiling via the Spark UI REST API (guide §1/§7.1): run each
suite query in one session with the UI on, then attribute wall clock to the
individual Spark jobs (description, duration, gaps).  Measurement only —
does not touch engine code or bench.py.

Usage: python scripts/profile_jobs_r06.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def jobs_snapshot(spark):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app}/jobs") as r:
        return json.load(r)


def main():
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
    from split_merge_partitioner_spark.session import get_spark
    from split_merge_partitioner_spark.sources import edges_from_lineitem
    from split_merge_partitioner_spark.storage import release

    spark = get_spark(app_name="smp-profile-jobs", master="local[32]",
                      extra_conf={"spark.ui.enabled": "true"})
    edges = edges_from_lineitem(spark, SF_DIR).persist()
    edges.count()
    res0 = fsm_partition(edges, p=32, k=2, merge="fast", splitter="hep_local")
    assigned = res0.assigned.persist()
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

    def run_edges():
        e2 = edges_from_lineitem(spark, SF_DIR).persist()
        e2.count()
        release(e2)

    queries = {
        "edge_derivation": run_edges,
        "fsm_partition": run_fsm,
        "partition_stats": lambda: partition_stats(assigned, p=32).toPandas(),
        "pagerank_20": lambda: pagerank(edges, assigned=assigned, mode="gas",
                                        tol=0.0, max_iter=20),
        "connected_components": lambda: connected_components(
            edges, assigned=assigned, mode="gas"),
        "triangle_count": lambda: triangle_count(edges),
        "louvain_3rounds": run_louvain,
        "approx_diameter": lambda: approximate_diameter(edges, assigned=assigned),
        "minhash_dedup": lambda: minhash_near_duplicates(docs, threshold=0.4).count(),
        "lsh_knn": lambda: lsh_knn(emb, k=5, n_planes=4, n_tables=6).count(),
        "ivf_knn": lambda: ivf_knn(emb, k=5).count(),
    }
    wanted = sys.argv[1:] or list(queries)
    for name in wanted:
        fn = queries[name]
        before = {j["jobId"] for j in jobs_snapshot(spark)}
        spark.sparkContext.setJobDescription(name)
        t0 = time.monotonic()
        fn()
        wall = time.monotonic() - t0
        time.sleep(0.3)
        after = jobs_snapshot(spark)
        new = sorted((j for j in after if j["jobId"] not in before),
                     key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(new)} jobs ===")
        total_job = 0.0
        prev_end = None
        for j in new:
            sub = j.get("submissionTime", "")
            comp = j.get("completionTime", "")
            try:
                from datetime import datetime
                fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                ts = datetime.strptime(sub.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                te = datetime.strptime(comp.replace("GMT", ""), "%Y-%m-%dT%H:%M:%S.%f")
                dur = (te - ts).total_seconds()
                gap = (ts - prev_end).total_seconds() if prev_end else 0.0
                prev_end = te
            except Exception:
                dur, gap = -1, 0
            total_job += max(dur, 0)
            desc = (j.get("description") or "")[:90]
            print(f"  job {j['jobId']:>4} dur={dur:6.3f}s gap={gap:6.3f}s "
                  f"tasks={j.get('numTasks', '?'):>4} {desc}")
        print(f"  sum(job durations)={total_job:.3f}s  wall-jobs gap={wall - total_job:.3f}s")
    spark.stop()


if __name__ == "__main__":
    main()
