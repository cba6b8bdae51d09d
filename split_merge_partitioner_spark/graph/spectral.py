"""Spectral bisection — Fiedler-style partition from a deflated lazy-walk
power iteration, in EXACT truncating-integer arithmetic.

The classic spectral partitioner (Fiedler 1973; Shi & Malik's normalized
cut relaxation): the second eigenvector of the random-walk operator
P = D^-1 A orders vertices so that a balanced split of the ordering
approximates the minimum normalized cut.  This complements the engine's
assignment partitioners (FSM/DBH/HDRF...): they place EDGES given a
bucket count; this derives a VERTEX geometry from the graph itself.

Exactness scheme (the eigencentrality.py discipline, extended to signed
state): every iterate is a BIGINT vector on a fixed scale.  One step is

    px(v) = (sum_{u~v} x(u)) div d(v)          -- P·x, truncating div
    y0    = (x + px) div 2                     -- lazy walk (I+P)/2:
                                                  kills the -1 eigenvalue
                                                  on bipartite graphs
    S     = sum_v d(v) * y0(v)                 -- pi-inner product with 1
    y1(v) = y0(v) - S div (2m)                 -- deflate the known
                                                  lambda=1 eigenvector
                                                  (right eigvec 1, left pi
                                                  = d/2m: coefficient
                                                  (pi . y0)/(pi . 1))
    x'(v) = (y1(v) * scale) div max(|y1|, 1)   -- renormalize to +-scale

Both engines truncate integer division toward zero (`div` in Spark,
`//` in DuckDB — verified including negatives), so the whole chain is
bit-deterministic and the DuckDB oracle replays it hash-for-hash.  The
floor noise is O(1) per step against scale = 1e9 — invisible to the sign
structure the cut uses.  x0 is a splitmix64 pseudo-random +-2^30 vector
(deterministic, engine-portable via the low-31-bit mask).

Plan per superstep: ONE data exchange (the gather groupBy; the gather
join is co-located — state hash-partitioned by vertex, the static doubled
relation by neighbor) plus two SINGLE-ROW scalar aggregates (S and max
|y1|) broadcast-cross-joined back — never collected to the driver.  State
localCheckpointed per step (constant plans).  The final median split is
one ROW_NUMBER window over the n-row score relation (vertex-scale, the
degree_gini-documented cost), giving exactly balanced sides.

Overflow is guarded eigencentrality-style: the worst intermediate is
|S| <= 2m * scale (and scale^2 at the renormalize), checked against
2^63 with a fail-fast ValueError naming the remedy (lower ``scale``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..storage import release
from .walks import _sm64


def spectral_bisect(
    edges: DataFrame, n_iter: int = 20, scale: int = 10**9
) -> DataFrame:
    """(vertex, fiedler, bucket): the scale-normalized integer Fiedler
    iterate after ``n_iter`` deflated lazy-walk steps, and the balanced
    bisection bucket (0/1) from the median split of the (fiedler, vertex)
    ordering."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    spark = edges.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ansi_was = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    und = deg = state = None
    try:
        und = (
            edges.select(F.col("src").alias("v"), F.col("dst").alias("nb"))
            .unionAll(edges.select(F.col("dst").alias("v"), F.col("src").alias("nb")))
            .repartition(shuffle_n, "nb")
            .localCheckpoint(eager=True)
        )
        deg = (
            und.groupBy(F.col("v").alias("vertex"))
            .agg(F.count(F.lit(1)).cast("long").alias("degree"))
            .localCheckpoint(eager=True)
        )
        lims = deg.agg(
            F.max("degree").alias("dmax"), F.sum("degree").alias("two_m")
        ).collect()[0]
        dmax, two_m = int(lims["dmax"] or 0), int(lims["two_m"] or 0)
        if two_m == 0:
            return spark.createDataFrame([], "vertex long, fiedler long, bucket int")
        worst = max(two_m * scale, scale * scale)  # |S| / renormalize bound
        if worst >= 2**63:
            max_scale = min((2**63 - 1) // two_m, int((2**63 - 1) ** 0.5))
            raise ValueError(
                f"scale={scale} can overflow BIGINT at 2m={two_m}, dmax={dmax}; "
                f"lower scale to <= {max_scale}"
            )

        # x0: deterministic +-2^30 pseudo-random vector (low-31-bit mask is
        # identical on signed Spark longs and the oracle's UBIGINT)
        state = (
            deg.select(
                "vertex",
                (
                    _sm64(F.col("vertex")).bitwiseAND(F.lit((1 << 31) - 1))
                    - F.lit(1 << 30)
                ).cast("long").alias("x"),
            )
            .repartition(shuffle_n, "vertex")
            .localCheckpoint(eager=True)
        )
        for _ in range(n_iter):
            gathered = (
                und.join(
                    state.select(F.col("vertex").alias("nb"), "x").hint("shuffle_hash"),
                    "nb",
                )
                .groupBy(F.col("v").alias("vertex"))
                .agg(F.sum("x").alias("s"))
            )
            y0 = (
                state.join(gathered, "vertex")
                .join(deg.hint("shuffle_hash"), "vertex")
                .select(
                    "vertex",
                    "degree",
                    F.expr("(x + (s div degree)) div 2").alias("y0"),
                )
            )
            sc = y0.agg(F.sum(F.col("degree") * F.col("y0")).alias("S"))
            y1 = y0.crossJoin(F.broadcast(sc)).select(
                "vertex",
                F.expr(f"y0 - (S div {two_m})").alias("y1"),
            )
            mx = y1.agg(F.greatest(F.max(F.abs(F.col("y1"))), F.lit(1)).alias("mx"))
            new_state = (
                y1.crossJoin(F.broadcast(mx))
                .select("vertex", F.expr(f"(y1 * {scale}) div mx").alias("x"))
                .repartition(shuffle_n, "vertex")
                .localCheckpoint(eager=True)
            )
            release(state)
            state = new_state

        w = Window.orderBy(F.col("x").asc(), F.col("vertex").asc())
        n_row = state.count()
        out = state.select(
            "vertex",
            F.col("x").alias("fiedler"),
            F.when(F.row_number().over(w) <= n_row // 2, F.lit(0))
            .otherwise(F.lit(1))
            .cast("int")
            .alias("bucket"),
        )
        # materialize: the result must not pin the state/static lineage
        out = out.localCheckpoint(eager=True)
        return out
    finally:
        spark.conf.set("spark.sql.ansi.enabled", ansi_was)
        for df in (und, deg, state):
            if df is not None:
                release(df)
