"""Time-respecting (temporal) reachability over an event log — "who can an
infection / rumor / compromise starting at these seeds reach, and when?"

Temporal-graph semantics (Holme & Saramäki, *Temporal Networks*, Phys.Rep.
2012): users are in contact when they are active in the same
(event_type, time-window) bucket; information can only flow FORWARD in
time, so u reaches v iff there is a sequence of bucket co-occurrences with
non-decreasing window indices.  Static reachability over the co-change
projection (sources/edges.py::cochange_edges) OVERSTATES spread — it happily
routes through a contact that happened before the carrier was infected.
The canonical query is EARLIEST ARRIVAL: the smallest window at which each
user can have been reached.

Execution — the whole point is to never materialize user-user contact
pairs.  A popular bucket with 10⁴ members implies 10⁸ contact edges; the
bipartite incidence (user, bucket) has only 10⁴ rows for it.  Arrival
propagates through bucket OCCURRENCES instead:

    infected u with arrival a(u), incidence (u, type, w), w ≥ a(u)
        ⇒ occurrence (type, w) is infectious
        ⇒ every member v of (type, w) has arrival ≤ w.

Superstep (frontier = users whose arrival improved):
  1. frontier ⋈ incidence (co-located on user), keep w ≥ arrival →
     infectious occurrences (distinct),
  2. occurrences ⋈ incidence (co-located on (type, w)) → candidate
     (user, w), map-side-combined MIN per user,
  3. candidates that BEAT the current arrival become the next frontier.

Arrivals only decrease and live in the finite window domain, so the
fixpoint is exact; rounds = max hop count of an optimal time-respecting
path (not the number of windows).  All integers (window index = epoch-µs
div window, the shared EPOCH_US_SQL template), so the DuckDB oracle
replays arrivals exactly with one recursive CTE.

At 100 TB: state is one (user, arrival) row per reached user; per round
two co-located exchanges bounded by the incidence slice touched — hub
buckets cost their membership, never its square.

No counterpart in the reference (a partitioner); the incidence derivation
is shared bit-for-bit with cochange_edges (sources/edges.py:225-258).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..storage import release


def temporal_reachability(
    events: DataFrame,
    seeds: list[int],
    window_seconds: int = 3600,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    max_rounds: int = 64,
) -> tuple[DataFrame, dict]:
    """((user_id, arrival_win), info): earliest time-respecting arrival
    window for every user reachable from ``seeds``.

    Seeds are infected "before the log starts" and report arrival_win = 0
    (every real window index is positive for post-1970 data); a reached
    user's arrival_win is the absolute window index (epoch-µs div
    window_seconds·1e6) of the earliest bucket occurrence that can have
    infected them.  Unreached users are absent.
    """
    from ..functions.events import EPOCH_US_SQL

    if not seeds:
        raise ValueError("temporal_reachability needs a non-empty seed set")
    if window_seconds <= 0:
        raise ValueError("window_seconds must be positive")
    spark = events.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    window_us = int(window_seconds) * 1_000_000
    win = F.expr(f"({EPOCH_US_SQL.format(col=ts_col)}) div {window_us}")
    scratch: list = []
    try:
        inc = (
            events.select(
                F.col(user_col).cast("long").alias("u"),
                F.col(type_col).alias("et"),
                win.cast("long").alias("w"),
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        scratch.append(inc)
        inc_u = inc.repartition(shuffle_n, "u").localCheckpoint(eager=True)
        scratch.append(inc_u)
        inc_b = inc.repartition(shuffle_n, "et", "w").localCheckpoint(eager=True)
        scratch.append(inc_b)

        seed_rows = [(int(v), 0) for v in sorted(set(seeds))]
        arr = spark.createDataFrame(seed_rows, "u long, a long").localCheckpoint(
            eager=True
        )
        scratch.append(arr)
        frontier = arr

        info = {"rounds": 0, "converged": False}
        for r in range(max_rounds):
            hits = (
                frontier.hint("shuffle_hash")
                .join(inc_u, "u")
                .where(F.col("w") >= F.col("a"))
                .select("et", "w")
                .distinct()
            )
            cand = (
                hits.hint("shuffle_hash")
                .join(inc_b, ["et", "w"])
                .groupBy("u")
                .agg(F.min("w").alias("na"))
            )
            improved = (
                cand.join(arr, "u", "left")
                .where(F.col("a").isNull() | (F.col("na") < F.col("a")))
                .select("u", F.col("na").alias("a"))
                .localCheckpoint(eager=True)
            )
            scratch.append(improved)
            info["rounds"] = r + 1
            if improved.isEmpty():
                info["converged"] = True
                break
            arr = (
                arr.join(improved.select("u"), "u", "left_anti")
                .unionAll(improved)
                .localCheckpoint(eager=True)
            )
            scratch.append(arr)
            frontier = improved
        if not info["converged"]:
            raise RuntimeError(
                f"temporal_reachability: arrivals still improving after "
                f"{max_rounds} rounds — raise max_rounds (bounded by the "
                "longest optimal time-respecting path's hop count)."
            )
        out = arr.select(
            F.col("u").alias("user_id"), F.col("a").alias("arrival_win")
        ).localCheckpoint(eager=True)
        return out, info
    finally:
        for df in scratch:
            release(df)
