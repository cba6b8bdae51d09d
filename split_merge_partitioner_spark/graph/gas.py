"""Partition-aligned gather-scatter (GAS) core over CSR-encoded Arrow blocks.

This is the PowerGraph-style execution the reference's partitions feed
(full.pdf §5.4): a vertex-cut assigns each edge to exactly one partition; a
vertex is *replicated* on every partition that owns one of its edges, and the
per-superstep network cost is proportional to the replication factor — which
is why FSM's lower RF translates to faster PageRank/CC (full.pdf §5.2.2).

Per superstep:
 1. mirror state:  replicas(bucket, vertex) JOIN state(vertex, ...) — a shuffle
    of O(RF * n) rows, the RF-governed cost;
 2. local scatter: cogroup(mirror-state, edges) by bucket -> applyInPandas
    kernel builds a local CSR (NumPy searchsorted index + add.at) and emits
    per-local-vertex partials — pure Arrow batches, no per-row Python;
 3. combine:       groupBy(vertex) global aggregation of partials (Catalyst
    does map-side partial agg).

Lineage management: supersteps chain LAZILY; every ``checkpoint_every`` steps
the state is localCheckpoint(eager)-ed, truncating lineage and materializing
one job per block of supersteps instead of one per superstep (iteration
lineage blowup is the classic failure mode at 100+ supersteps).  Convergence
checks piggyback on those boundaries, so the block-delta is checked — a
conservative (stricter) criterion than per-step delta.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..storage import release

CHECKPOINT_EVERY = 5


def at_boundary(superstep: int, every: int = CHECKPOINT_EVERY) -> bool:
    return (superstep + 1) % every == 0


def truncate(state: DataFrame, prev_checkpoint: DataFrame | None) -> DataFrame:
    """Materialize + truncate lineage; release the previous checkpoint."""
    out = state.localCheckpoint(eager=True)
    if prev_checkpoint is not None:
        release(prev_checkpoint)
    return out
