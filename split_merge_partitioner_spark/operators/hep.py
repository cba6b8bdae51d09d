"""Standalone HEP (Hybrid Edge Partitioner) baseline.

Reference parity (/root/reference/src/hep_partitioner.cpp:419-449 — the
``-method hep`` dispatch, src/main.cpp:68-69): the same in-memory neighbor
expansion as NE but over the low-degree-only adjacency with lazy degrees
(partition_in_memory, cpp:305-371; in_memory_add_boundary, hpp:76-213):

- high-degree vertices (degree > hdf * avg_degree, src/hep_graph.cpp:17) are
  permanently in-core — never expanded, never heaped (hpp:88-93)
- a full bucket overflows mid-expansion to bucket+1 (hpp:126,140)
- unassigned low edges are HDRF-scored over all buckets
  (in_memory_assign_remaining, cpp:167-201); hub-hub edges never enter the
  expansion and therefore land in the same HDRF-scored remainder — our
  analog of the streamed ``.h2h_edgelist`` pass (hdrf_streaming, cpp:204-258)

The paper reports HEP-10/HEP-100 as the fast single-machine baseline FSM is
measured against (full.pdf Tables 3/4; sk-2005: HEP-10 72 s vs NE 1869 s)
and as FSM's own split engine — here the shared kernel
(fsm._hep_lite_group) is exposed standalone, mirroring operators/ne.py:

- mode="sequential": ONE task runs the whole expansion into [0, p) — the
  faithful single-stream baseline contract (deterministic min-degree
  free-vertex scan substituted for the reference's std::random_device per
  SURVEY.md §7).
- mode="grouped": p locality groups each expand into the same global bucket
  space with partition-local state — the documented scale deviation, for an
  HEP-shaped baseline on inputs one task can't hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fsm import DEFAULT_HDF, _hep_lite_group, _locality_grouped, _NE_SCHEMA


def hep_partition(
    edges: DataFrame,
    p: int,
    hdf: float = DEFAULT_HDF,
    mode: str = "sequential",
    grouping: str = "range",
    deg: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, bucket) HEP edge partition into p buckets."""
    if deg is None:
        from ..sources.edges import degrees as degrees_of

        deg = degrees_of(edges).localCheckpoint(eager=True)
    avg = deg.agg(F.avg("degree").alias("a")).collect()[0]["a"]
    high_threshold = hdf * float(avg)
    degb = F.broadcast(deg)
    e = (
        edges.join(
            degb.withColumnRenamed("vertex", "src").withColumnRenamed("degree", "deg_src"),
            "src",
        ).join(
            degb.withColumnRenamed("vertex", "dst").withColumnRenamed("degree", "deg_dst"),
            "dst",
        )
    )
    if mode == "sequential":
        grouped = e.select(
            F.lit(0).cast("long").alias("grp"), "src", "dst", "deg_src", "deg_dst"
        )
    elif mode == "grouped":
        grouped = _locality_grouped(e, p, grouping).select(
            "grp", "src", "dst", "deg_src", "deg_dst"
        )
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return grouped.groupBy("grp").applyInPandas(
        _hep_lite_group(p, high_threshold, global_buckets=True), schema=_NE_SCHEMA
    )
