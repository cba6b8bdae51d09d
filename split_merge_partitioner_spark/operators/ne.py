"""Standalone NE (Neighbor Expansion) baseline partitioner.

Reference parity (/root/reference/src/ne_partitioner.cpp:43-112):
- for each bucket until capacity = m * 1.00 / p + 1 (:49,
  ne_partitioner.hpp:18): pop the min-degree boundary vertex from a min-heap
  (or scan for a free vertex), move it to the core, pull its neighbors into
  the boundary, assigning unassigned incident edges whose other endpoint is
  already covered (add_boundary/occupy_vertex, ne_partitioner.hpp:68-130)
- leftovers go to the LAST bucket (assign_remaining, :88-112)

The paper uses NE as its main RF yardstick (full.pdf §5.2.2: FSM's RF ≈ NE's)
and reports it as the SLOW sequential baseline (sk-2005: NE 1869 s vs
HEP-10 72 s, Table 3).  Two modes:

- mode="sequential": ONE task runs the whole expansion — the faithful
  baseline contract (bit-for-bit order differs from the reference because our
  free-vertex scan is min-degree-first and seeded-deterministic instead of
  std::random_device, a documented substitution per SURVEY.md §7).  Use for
  RF comparisons at fixture scale, not at 100 TB — the reference itself is
  single-threaded here.
- mode="grouped": p locality groups each run NE into the same global bucket
  space [0, p) with partition-local state (the HDRF-style distribution
  deviation) — the scale path when an NE-shaped baseline is wanted on big
  inputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .fsm import _locality_grouped, _ne_lite_group, _NE_SCHEMA


def ne_partition(
    edges: DataFrame,
    p: int,
    mode: str = "sequential",
    grouping: str = "range",
    deg: DataFrame | None = None,
) -> DataFrame:
    """(src, dst, bucket) NE edge partition into p buckets."""
    if mode == "sequential":
        grouped = edges.select(F.lit(0).cast("long").alias("grp"), "src", "dst")
    elif mode == "grouped":
        from ..sources.edges import degrees as degrees_of

        if deg is None:
            deg = degrees_of(edges).localCheckpoint(eager=True)
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
        grouped = _locality_grouped(e, p, grouping).select("grp", "src", "dst")
    else:
        raise ValueError(f"unknown mode {mode!r}")
    return grouped.groupBy("grp").applyInPandas(
        _ne_lite_group(p, global_buckets=True), schema=_NE_SCHEMA
    )
