"""Approximate diameter via deterministic double-sweep BFS.

The paper's third downstream workload (full.pdf §5.4 runs PR, CC and
approximate diameter over the partitions; FSM improves AD runtime by up to
57%).  Double sweep: BFS from a deterministic seed (max-degree vertex, min id
on ties), then BFS from the farthest vertex found (max distance, min id on
ties); the second sweep's eccentricity is the classic diameter lower bound —
exact on trees, near-exact on the small-diameter power-law graphs the
reference targets.

Execution: same broadcast-encoded machinery as pagerank/components — edge
blocks encoded once, ONE stage per BFS level, each partition emitting only
IMPROVED (vertex, dist) rows, fixpoint when nothing improves.  Level count =
diameter, which is small on these graphs.  Above the state threshold the
same sweep can run over the cogroup path; at >5M-vertex scale prefer
HyperANF-style sketches (out of scope; this is the paper-parity operator).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNREACHED = np.iinfo(np.int64).max


def _bfs_dense(spark, enc, n: int, seed_idx: int, max_levels: int) -> np.ndarray:
    """Dense BFS distances (int64; unreached = _UNREACHED) over the encoded
    blocks; one Spark stage per level."""
    dist = np.full(n, _UNREACHED, dtype=np.int64)
    dist[seed_idx] = 0
    for _ in range(max_levels):
        bc = spark.sparkContext.broadcast(dist)

        def scatter(batches, _bc=bc):
            d0 = _bc.value
            cur = d0.copy()
            touched = False
            for pdf in batches:
                s = pdf["s"].to_numpy(np.int64)
                d = pdf["d"].to_numpy(np.int64)
                # relax both directions; +1 with overflow guard on UNREACHED
                cand = np.where(cur[s] < _UNREACHED, cur[s] + 1, _UNREACHED)
                np.minimum.at(cur, d, cand)
                cand = np.where(cur[d] < _UNREACHED, cur[d] + 1, _UNREACHED)
                np.minimum.at(cur, s, cand)
                touched = True
            if touched:
                imp = np.flatnonzero(cur < d0)
                if len(imp):
                    yield pd.DataFrame({"vid": imp, "dist": cur[imp]})

        got = enc.mapInPandas(scatter, schema="vid long, dist long").toPandas()
        bc.destroy()
        if len(got) == 0:
            break
        new = dist.copy()
        np.minimum.at(new, got["vid"].to_numpy(np.int64), got["dist"].to_numpy(np.int64))
        if (new == dist).all():
            break
        dist = new
    return dist


def bfs_distances(
    edges: DataFrame, source: int, assigned: DataFrame | None = None,
    max_levels: int = 200,
) -> DataFrame:
    """(vertex, dist) for the source's component (unreached vertices omitted)."""
    out, _ = _double_sweep_impl(edges, assigned, max_levels, source=source,
                                distances_only=True)
    return out


def approximate_diameter(
    edges: DataFrame, assigned: DataFrame | None = None, max_levels: int = 200,
) -> tuple[DataFrame, dict]:
    """One-row (seed, far_vertex, diameter) DataFrame + info dict."""
    return _double_sweep_impl(edges, assigned, max_levels)


def _double_sweep_impl(edges, assigned, max_levels, source=None, distances_only=False):
    from ..sources.edges import degrees as degrees_of

    spark = edges.sparkSession
    deg_pdf = degrees_of(edges).toPandas().sort_values("vertex")
    verts = deg_pdf["vertex"].to_numpy(np.int64)
    degv = deg_pdf["degree"].to_numpy(np.int64)
    n = len(verts)
    bc_verts = spark.sparkContext.broadcast(verts)

    def encode(batches):
        vv = bc_verts.value
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "s": np.searchsorted(vv, pdf["src"].to_numpy(np.int64)).astype(np.int64),
                    "d": np.searchsorted(vv, pdf["dst"].to_numpy(np.int64)).astype(np.int64),
                }
            )

    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    base = assigned if assigned is not None else edges.withColumn("bucket", F.spark_partition_id())
    enc = (
        base.select("bucket", "src", "dst")
        .repartition(shuffle_n, "bucket")
        .mapInPandas(encode, schema="s long, d long")
        .localCheckpoint(eager=True)
    )
    aqe_was = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")

    if source is not None:
        seed_idx = int(np.searchsorted(verts, source))
        assert seed_idx < n and verts[seed_idx] == source, "unknown source vertex"
    else:
        # deterministic seed: max degree, min id on ties (verts sorted by id)
        seed_idx = int(np.argmax(degv))
    d1 = _bfs_dense(spark, enc, n, seed_idx, max_levels)
    if distances_only:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        reach = d1 < _UNREACHED
        return (
            spark.createDataFrame(
                pd.DataFrame({"vertex": verts[reach], "dist": d1[reach]})
            ),
            {"levels": int(d1[reach].max()) if reach.any() else 0},
        )
    reach = d1 < _UNREACHED
    ecc1 = int(d1[reach].max())
    far_idx = int(np.flatnonzero(reach & (d1 == ecc1))[0])  # min id on ties
    d2 = _bfs_dense(spark, enc, n, far_idx, max_levels)
    reach2 = d2 < _UNREACHED
    diameter = int(d2[reach2].max())
    spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
    out = spark.createDataFrame(
        pd.DataFrame(
            {
                "seed": [int(verts[seed_idx])],
                "far_vertex": [int(verts[far_idx])],
                "diameter": [diameter],
            }
        )
    )
    return out, {"ecc_sweep1": ecc1, "component_size": int(reach.sum())}
