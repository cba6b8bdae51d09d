"""Executor-storage release that works for localCheckpoint() relations.

``DataFrame.unpersist()`` only drops cache-manager entries, i.e. relations
registered via ``persist()``/``cache()``.  A ``localCheckpoint()`` relation
is a ``LogicalRDD`` over a lineage-truncated RDD whose blocks the cache
manager never sees — calling ``unpersist()`` on the DataFrame is a silent
no-op for them (verified against pyspark 4.1: the block stays in
``sc.getRDDStorageInfo()`` forever).  Since the iterative operators here
checkpoint per-round state, that no-op is the difference between constant
executor storage and a leak of one relation per round.

``release()`` handles every case: RDDs, persisted DataFrames, and
localCheckpointed DataFrames (by unpersisting the LogicalRDD's underlying
RDD directly).  Only call it when the relation is truly dead — a
localCheckpointed RDD cannot be recomputed once its blocks are dropped
(that is the point of lineage truncation).
"""

from __future__ import annotations


def release(df) -> None:
    """Drop all executor storage backing ``df`` (DataFrame or RDD); no-op
    for plain un-persisted relations and on any introspection failure —
    cleanup must never fail a job."""
    if df is None:
        return
    if not hasattr(df, "_jdf"):  # an RDD: its native unpersist works
        df.unpersist()
        return
    try:
        df.unpersist()  # cache-manager entry, if any (persist()/cache())
    except Exception:
        pass
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
