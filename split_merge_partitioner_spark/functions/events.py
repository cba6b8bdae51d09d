"""Event-stream relational operators: gap-based sessionization and an
as-of (most-recent-prior) join.

Both are built from JVM-side window functions only (whole-stage codegen, no
UDF, no per-user quadratics) and restricted to SQL-portable, exact-integer
arithmetic (microsecond epochs, value micros) so the DuckDB oracle can
replicate them bit-for-bit.

Scale notes (100 TB / 10^9-user regime):

- ``sessionize`` is the classic one-pass sessionizer: a lag window and a
  running sum, both partitioned by ``user_id``, then a per-session
  aggregate over (user_id, session_id).  Catalyst plans exactly ONE
  Exchange (hash by user_id, explain-audited): the grouping key extends
  the window partition key, so the final aggregate runs in place on the
  window's partitioning.  Per-user state is one row of lag — nothing
  accumulates.
- ``asof_latest`` is the union+window formulation of an as-of join: tag
  right rows 0 and left rows 1, sort each user by (ts, tag, event_id), and
  carry the last non-null right payload forward with
  ``last(..., ignorenulls=True)``.  One exchange, linear work, no
  per-row subqueries — the shape that survives a 10^12-event table where
  the naive "max ts <= t per row" correlated join is quadratic per user.

No counterpart in the reference engine (a graph partitioner); these cover
the event-log half of a web-scale analytics workload the way
``graph/*`` covers the link-graph half.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# shared SQL template so derived expressions (e.g. integer window ids in
# sources/edges.py::cochange_edges) stay bit-identical to _epoch_us
EPOCH_US_SQL = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"


def _epoch_us(ts_col: str):
    """Microseconds since 1970-01-01 00:00:00, timezone-FREE: computed as a
    timestampdiff against a fixed NTZ epoch so TIMESTAMP_NTZ columns (what
    parquet timestamps load as) never pass through a session-timezone cast.
    Bit-identical to DuckDB's epoch_us(naive ts)."""
    return F.expr(EPOCH_US_SQL.format(col=ts_col)).cast("long")


def sessionize(
    events: DataFrame,
    gap_seconds: int = 14_400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str | None = "value",
) -> DataFrame:
    """Split each user's event stream into sessions at inactivity gaps
    strictly greater than ``gap_seconds``.

    Returns one row per session: (user_id, session_id, n_events, start_us,
    end_us, duration_us[, value_micros_sum]) with session_id numbered from
    1 per user in time order.  All outputs are exact integers:
    microsecond epochs and, when ``value_col`` is given, the sum of
    round(value * 1e6) per session — deterministic across engines where a
    double sum would not be.

    Ordering within a user is (ts, event_id): event_id is unique, so the
    session numbering is total and retry-stable.
    """
    gap_us = int(gap_seconds) * 1_000_000
    us = _epoch_us(ts_col)
    flagged = events.select(
        F.col(user_col).alias("user_id"),
        us.alias("ts_us"),
        F.col(id_col).alias("event_id"),
        *([F.round(F.col(value_col) * 1e6).cast("long").alias("value_micros")]
          if value_col is not None else []),
    ).withColumn(
        "new_session",
        F.when(
            (F.col("ts_us") - F.lag("ts_us").over(
                Window.partitionBy("user_id").orderBy("ts_us", "event_id")
            )) > F.lit(gap_us),
            F.lit(1),
        ).otherwise(F.lit(0)).cast("long"),
    )
    # running sum of boundary flags = session index (first event's lag is
    # NULL -> flag 0 -> sessions start at 0; +1 for 1-based ids)
    w2 = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sess = flagged.withColumn("session_id", (F.sum("new_session").over(w2) + 1))
    aggs = [
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts_us").alias("start_us"),
        F.max("ts_us").alias("end_us"),
        (F.max("ts_us") - F.min("ts_us")).alias("duration_us"),
    ]
    if value_col is not None:
        aggs.append(F.sum("value_micros").alias("value_micros_sum"))
    return sess.groupBy("user_id", "session_id").agg(*aggs)


def asof_latest(
    events: DataFrame,
    left_type: str,
    right_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """As-of join within one event stream: for every ``left_type`` event,
    the most recent ``right_type`` event of the same user with
    ``right.ts <= left.ts`` (ties at equal ts match — the right row sorts
    first via the tag; among equal-ts rights the largest event_id wins).

    Returns (user_id, event_id, ts_us, matched_event_id, matched_ts_us,
    matched_value_micros) for every left event; the matched columns are
    NULL when no prior right event exists.

    Implementation: union-tag + ``last(ignorenulls=True)`` running window —
    one exchange by user, linear in events, no correlated subquery.  The
    equivalent declarative form (a theta-join on ts ranges) is what blows
    up on power-law users at 10^12 rows.
    """
    base = events.select(
        F.col(user_col).alias("user_id"),
        _epoch_us(ts_col).alias("ts_us"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("event_type"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("value_micros"),
    )
    lefts = base.where(F.col("event_type") == left_type).select(
        "user_id", "ts_us", "event_id",
        F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("r_event_id"),
        F.lit(None).cast("long").alias("r_ts_us"),
        F.lit(None).cast("long").alias("r_value_micros"),
    )
    rights = base.where(F.col("event_type") == right_type).select(
        "user_id", "ts_us", "event_id",
        F.lit(0).alias("tag"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts_us").alias("r_ts_us"),
        F.col("value_micros").alias("r_value_micros"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lefts.unionAll(rights).select(
        "user_id", "ts_us", "event_id", "tag",
        F.last("r_event_id", ignorenulls=True).over(w).alias("matched_event_id"),
        F.last("r_ts_us", ignorenulls=True).over(w).alias("matched_ts_us"),
        F.last("r_value_micros", ignorenulls=True).over(w).alias("matched_value_micros"),
    )
    return carried.where(F.col("tag") == 1).select(
        "user_id", "event_id", "ts_us",
        "matched_event_id", "matched_ts_us", "matched_value_micros",
    )


def range_join(
    left: DataFrame,
    intervals: DataFrame,
    on: str | list[str] | None = None,
    ts_col: str = "ts",
    start_col: str = "start_us",
    end_col: str = "end_us",
    bucket_us: int = 3_600_000_000,
    max_buckets_per_interval: int = 4_096,
) -> DataFrame:
    """Interval containment join: every ``left`` row whose event time t
    (microsecond epoch of ``ts_col``) satisfies start_us <= t < end_us,
    optionally ALSO matching equality key(s) ``on`` — the "which campaign
    windows / maintenance windows / sessions does this event fall in"
    join.  Returns left columns + interval columns (+ nothing else; both
    inputs keep their names, which must not collide except ``on``).

    Scale shape: a naive t BETWEEN start AND end predicate gives Catalyst
    no equi-key — BroadcastNestedLoop (or a per-key cartesian) at 10^12
    events.  Here each interval is exploded into the coarse time BUCKETS
    it covers (floor-division by ``bucket_us``), the join runs on
    (on?, bucket) as a plain hash equi-join, and the exact containment
    predicate filters after — the standard bucketed range-join (what
    Databricks' range-join hints do under the hood).  Exploded rows per
    interval = ceil(span / bucket_us), fail-fast capped at
    ``max_buckets_per_interval`` (raise the bucket size for long
    intervals — the error names the remedy).  All bucket arithmetic is
    integer, so the operator stays SQL-replayable.
    """
    on_keys = [on] if isinstance(on, str) else list(on or [])
    t = _epoch_us(ts_col)
    lb = left.withColumn("__t_us__", t).withColumn(
        "__bucket__", F.expr(f"__t_us__ div {int(bucket_us)}")
    )
    iv = intervals.withColumn(
        "__nb__",
        F.expr(f"(({end_col} - 1) div {int(bucket_us)}) - ({start_col} div {int(bucket_us)}) + 1"),
    )
    bad = iv.where(
        (F.col(end_col) <= F.col(start_col))
        | (F.col("__nb__") > max_buckets_per_interval)
    )
    if bad.limit(1).count():
        raise ValueError(
            "range_join: empty interval (end_us <= start_us) or interval "
            f"spanning > {max_buckets_per_interval} buckets of {bucket_us} us "
            "— fix the interval table or raise bucket_us/max_buckets_per_interval"
        )
    ivx = iv.withColumn(
        "__bucket__",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {int(bucket_us)}"),
                F.expr(f"({end_col} - 1) div {int(bucket_us)}"),
            )
        ),
    ).drop("__nb__")
    joined = lb.join(ivx, on_keys + ["__bucket__"]).where(
        (F.col("__t_us__") >= F.col(start_col)) & (F.col("__t_us__") < F.col(end_col))
    )
    return joined.drop("__bucket__", "__t_us__")


def funnel(
    events: DataFrame,
    steps: list[str],
    within_seconds: int | None = None,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-sequence funnel per user: how far through ``steps`` (e.g.
    view -> click -> purchase) each user progressed, taking the EARLIEST
    qualifying event at every stage (first step-1 event, then the first
    step-2 event strictly after it, ...), optionally requiring the whole
    run to fit in ``within_seconds`` of the stage-1 event.

    Returns (user_id, steps_completed, t_first_us, t_last_us) — exact
    microsecond epochs (the sessionize rule), t_last_us = completion time
    of the deepest stage reached; users with zero stage-1 events are
    omitted.  Greedy-earliest is the standard funnel semantics AND the
    safe one: taking the first qualifying event at each stage maximizes
    the remaining window, so it never under-reports reach for
    unwindowed funnels and matches the common analytics-engine
    (windowFunnel-style) definition for windowed ones.

    Scale shape: ONE aggregation per stage, all keyed by user (k stages =
    k user-keyed partial-aggregated exchanges over ever-shrinking
    qualifying sets) — never a per-user sequence materialization, no
    window over full event lists, no row explosion; at 10^12 events the
    stage-1 aggregate dominates and is already minimal.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    t = _epoch_us(ts_col)
    ev = events.select(
        F.col(user_col).alias("user_id"), F.col(type_col).alias("et"), t.alias("t")
    )
    cur = (
        ev.where(F.col("et") == steps[0])
        .groupBy("user_id")
        .agg(F.min("t").alias("t1"))
        .select("user_id", "t1", F.col("t1").alias("tk"), F.lit(1).alias("k"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = ev.where(F.col("et") == step).select(
            "user_id", F.col("t").alias("tn")
        )
        # only users sitting at stage i-1 may advance (a stage-1 user must
        # not skip straight to stage 3 just because a stage-3 event exists)
        eligible = cur.where(F.col("k") == i - 1)
        cond = (eligible.user_id == nxt.user_id) & (eligible.tk < F.col("tn"))
        if within_seconds is not None:
            cond = cond & (
                F.col("tn") <= eligible.t1 + within_seconds * 1_000_000
            )
        hit = (
            eligible.join(nxt, cond)
            .groupBy(eligible.user_id.alias("user_id"))
            .agg(F.min("t1").alias("t1"), F.min("tn").alias("tk"))
            .select("user_id", "t1", "tk", F.lit(i).alias("k"))
        )
        cur = (
            cur.join(
                hit.select(F.col("user_id").alias("__hu__")),
                cur.user_id == F.col("__hu__"),
                "left_anti",
            ).unionAll(hit)
        )
    return cur.select(
        "user_id",
        F.col("k").cast("long").alias("steps_completed"),
        F.col("t1").alias("t_first_us"),
        F.col("tk").alias("t_last_us"),
    )


def retention_cohorts(
    events: DataFrame,
    period_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention triangle: one row per (cohort_period, age_periods)
    with the number of cohort users active in that period and the exact-ppm
    retention ratio vs the cohort's own period-0 size.

    cohort(user) = the user's first active period; period = floor(epoch_us /
    (86400e6 * period_days)) — calendar-free integer bucketing, identical
    in every engine and timezone (the _epoch_us discipline).

    Plan: ONE user-keyed exchange (serving the (user, period) distinct, the
    per-user cohort min, and the co-located act-cohort join), one (cohort,
    age)-keyed partial-aggregated count, and one cohort-keyed window over
    the tiny cell relation for the period-0 base — no self-join, no second
    scan of the events table.  Per-user state never exceeds the user's
    distinct-period count — at 10^9 users x years of weekly periods this is
    the flat three-exchange shape a retention dashboard needs, not a
    per-user sequence materialization."""
    if period_days < 1:
        raise ValueError("period_days must be >= 1")
    us_per_period = 86_400_000_000 * period_days
    spark = events.sparkSession
    shuffle_n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    act = (
        events.select(F.col(user_col).alias("u"), _epoch_us(ts_col).alias("__us__"))
        # integer div, never float: us epochs (~1.7e18) exceed double's 2^53
        # exact-integer range, so a float quotient could mis-bucket edge rows
        .select("u", F.expr(f"__us__ div {us_per_period}L").alias("w"))
        # ONE user-keyed exchange serves all three user-keyed steps:
        # HashPartitioning(u) satisfies the (u, w) distinct, the per-user
        # min, and the act-coh join — explain-audited, no re-exchange
        .repartition(shuffle_n, "u")
        .distinct()
    )
    coh = act.groupBy("u").agg(F.min("w").alias("cw"))
    cell = (
        act.join(coh.hint("shuffle_hash"), "u")
        .groupBy(
            F.col("cw").alias("cohort_period"),
            (F.col("w") - F.col("cw")).alias("age_periods"),
        )
        .agg(F.count(F.lit(1)).alias("n_active_users"))
    )
    # period-0 base via a cohort-keyed window (cell is #cohorts x #ages rows
    # — tiny at any scale): no self-join, no recompute of the events scan
    w0 = Window.partitionBy("cohort_period")
    return cell.select(
        "cohort_period",
        "age_periods",
        "n_active_users",
        F.max(F.when(F.col("age_periods") == 0, F.col("n_active_users"))).over(
            w0
        ).alias("__n0__"),
    ).select(
        "cohort_period",
        "age_periods",
        "n_active_users",
        F.expr("(n_active_users * 1000000L) div __n0__").alias("retained_ppm"),
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """First-order Markov transition profile of the event stream: for every
    ordered pair of event types, how often a user's event of type A is
    IMMEDIATELY followed by one of type B, plus the row-normalized
    transition probability.

    Returns (from_type, to_type, n_transitions, prob_ppm) where prob_ppm =
    floor(n_transitions * 1e6 / Σ_B n_transitions(from_type, B)) — exact
    integer parts-per-million (the retention_cohorts discipline), so the
    cross-engine hash surface carries no float division.  Ordering within a
    user is (ts, event_id) — event_id is unique, so the successor relation
    is total and retry-stable.  Each user's LAST event has no successor and
    contributes nothing.

    Scale shape: one user-keyed exchange for the lead() window (per-user
    event counts are bounded, so no partition skew beyond the user
    distribution itself), then a groupBy over at most |types|² rows — the
    second exchange is trivially small.  No sequence materialization, no
    self-join on the event table.
    """
    us = _epoch_us(ts_col)
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    pairs = (
        events.select(
            F.col(user_col).alias("user_id"),
            us.alias("ts_us"),
            F.col(id_col).alias("event_id"),
            F.col(type_col).alias("from_type"),
        )
        .withColumn("to_type", F.lead("from_type").over(w))
        .where(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    # ppm via integer floor-div against the row-marginal window sum: the
    # retention_cohorts discipline (no float division on the hash surface)
    return counts.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr(
            "(n_transitions * 1000000L) div (sum(n_transitions) over "
            "(partition by from_type))"
        ).cast("long").alias("prob_ppm"),
    )


def attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    mode: str = "last",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Single-touch marketing attribution: credit each conversion event's
    value to the user's latest (``mode="last"``) or earliest
    (``mode="first"``) PRECEDING event whose type is in ``touch_types``;
    conversions with no preceding touch land on the literal type
    ``"(none)"``.

    Returns one row per credited type: (touch_type, n_conversions,
    value_micros_sum) with value summed as round(value·1e6) BIGINTs (the
    sessionize discipline — no float on the hash surface).

    Execution is ONE window pass, not an as-of join: union the touch and
    conversion streams, order per user by (ts, event_id), carry the
    running last/first touch type with last(..., ignorenulls) over the
    user window (first-touch = the same running carry, just never
    overwritten), then keep the conversion rows.  A heavy user costs one
    sorted partition scan — there is no conversions×touches row explosion
    anywhere, which is what kills join-based attribution on power-law
    users at 10^12 events.  "Preceding" is strict: a touch at the exact
    same microsecond counts only if its event_id sorts first (the total
    (ts, event_id) order decides, retry-stable).
    """
    if mode not in ("last", "first"):
        raise ValueError("mode must be 'last' or 'first'")
    if not touch_types:
        raise ValueError("touch_types must be non-empty")
    us = _epoch_us(ts_col)
    base = events.where(
        F.col(type_col).isin([conversion_type, *touch_types])
    ).select(
        F.col(user_col).alias("user_id"),
        us.alias("ts_us"),
        F.col(id_col).alias("event_id"),
        F.col(type_col).alias("et"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("value_micros"),
    )
    touch = F.when(F.col("et") != conversion_type, F.col("et"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carried = (
        F.last(touch, ignorenulls=True).over(w)
        if mode == "last"
        else F.first(touch, ignorenulls=True).over(w)
    )
    conv = (
        base.withColumn("touch_type", carried)
        .where(F.col("et") == conversion_type)
        .select(
            F.coalesce(F.col("touch_type"), F.lit("(none)")).alias("touch_type"),
            "value_micros",
        )
    )
    return conv.groupBy("touch_type").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.sum("value_micros").alias("value_micros_sum"),
    )


def decayed_user_value(
    events: DataFrame,
    half_life_seconds: int = 604_800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    max_age_periods: int = 62,
) -> DataFrame:
    """Recency-weighted per-user activity score with EXACT integer decay:
    each event contributes value_micros >> age_periods, where age_periods =
    how many whole half-lives before the newest event in the log — i.e. a
    power-of-two exponential decay computed as a BIGINT shift, never a
    float pow().  The standard "decayed engagement" ranking signal, made
    bit-deterministic (retry/partitioning/engine-invariant) by construction.

    Returns (user_id, n_events, decayed_value_micros); events older than
    ``max_age_periods`` half-lives contribute 0 (shift clamped — a >> of
    63+ is undefined-ish across engines, and the value has long underflowed
    to 0 anyway).

    Scale shape: one tiny max() aggregate broadcast as the reference epoch
    (scalar cross join — constant, not per-row), then ONE user-keyed
    map-side-combined groupBy over the events scan.  No window, no
    sequence materialization.
    """
    if half_life_seconds < 1:
        raise ValueError("half_life_seconds must be >= 1")
    period_us = int(half_life_seconds) * 1_000_000
    base = events.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"({EPOCH_US_SQL.format(col=ts_col)}) div {period_us}").alias("period"),
        F.round(F.col(value_col) * 1e6).cast("long").alias("value_micros"),
    )
    ref = base.agg(F.max("period").alias("ref_period"))
    aged = base.crossJoin(F.broadcast(ref)).select(
        "user_id",
        F.least(
            F.col("ref_period") - F.col("period"), F.lit(max_age_periods)
        ).alias("age"),
        "value_micros",
    )
    return aged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.expr("shiftright(value_micros, CAST(age AS INT))")).alias(
            "decayed_value_micros"
        ),
    )


def growth_accounting(
    events: DataFrame,
    period_seconds: int = 604_800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Standard growth-accounting decomposition per period: every active
    user is exactly one of NEW (first-ever period), RETAINED (also active
    the immediately previous period) or RESURRECTED (active before, but
    not last period); CHURNED(p) = active(p_prev) − retained(p) — users
    who were active in the previous observed period and did not return
    (when the previous observed period isn't p−1, retained(p) is
    necessarily 0 and the whole previous cohort churned, so the identity
    holds across activity gaps without special-casing).

    Returns one row per active period: (period, n_active, n_new,
    n_retained, n_resurrected, n_churned).  Periods are calendar-free
    integer epochs (epoch_us div period — the retention_cohorts rule);
    every count is an exact BIGINT.

    Scale shape: ONE user-keyed exchange serves the (user, period)
    distinct, the per-user first-period min and the per-user lag window
    (shared partitioning); the per-period rollup and the tiny
    period-ordered lag window for churn act on |periods| rows.
    """
    if period_seconds < 1:
        raise ValueError("period_seconds must be >= 1")
    period_us = int(period_seconds) * 1_000_000
    act = events.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"({EPOCH_US_SQL.format(col=ts_col)}) div {period_us}").alias("period"),
    ).distinct()
    w_user = Window.partitionBy("user_id").orderBy("period")
    classified = act.select(
        "user_id",
        "period",
        F.min("period").over(Window.partitionBy("user_id")).alias("first_period"),
        F.lag("period").over(w_user).alias("prev_period"),
    ).select(
        "period",
        F.when(F.col("period") == F.col("first_period"), F.lit("new"))
        .when(F.col("prev_period") == F.col("period") - 1, F.lit("retained"))
        .otherwise(F.lit("resurrected"))
        .alias("cls"),
    )
    per_period = classified.groupBy("period").agg(
        F.count(F.lit(1)).alias("n_active"),
        F.sum(F.when(F.col("cls") == "new", 1).otherwise(0)).alias("n_new"),
        F.sum(F.when(F.col("cls") == "retained", 1).otherwise(0)).alias("n_retained"),
        F.sum(F.when(F.col("cls") == "resurrected", 1).otherwise(0)).alias(
            "n_resurrected"
        ),
    )
    w_p = Window.orderBy("period")
    return per_period.select(
        "period",
        "n_active",
        "n_new",
        "n_retained",
        "n_resurrected",
        F.coalesce(
            F.lag("n_active").over(w_p) - F.col("n_retained"), F.lit(0)
        ).cast("long").alias("n_churned"),
    )


def rolling_user_activity(
    events: DataFrame,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per (user, active day): event count + value micros that day, plus the
    trailing ``window_days``-day rolling totals (current day inclusive) —
    the DAU-style engagement panel.

    Exactness: day = epoch_us // 86_400_000_000 (integer div — the
    retention_cohorts discipline), value as micros BIGINT, rolling sums via
    a RANGE window over the integer day (identical semantics in DuckDB).

    Scale: one map-side-combined groupBy(user, day) collapses the event
    volume to at most (users x active days) rows BEFORE the window; the
    window partitions by user (no global sort) and its frame is O(window)
    rows — the standard two-step that keeps a 100 TB event log out of the
    window operator.
    """
    day = (_epoch_us(ts_col) / F.lit(86_400_000_000)).cast("long")
    per_day = (
        events.select(
            F.col(user_col).alias("user_id"),
            day.alias("day"),
            F.round(F.col(value_col) * 1e6).cast("long").alias("vm"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("vm").alias("value_micros"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rangeBetween(-(window_days - 1), 0)
    )
    return per_day.select(
        "user_id",
        "day",
        "n_events",
        "value_micros",
        F.sum("n_events").over(w).alias("n_events_rolling"),
        F.sum("value_micros").over(w).alias("value_micros_rolling"),
    )


def rfm_segments(
    events: DataFrame,
    n_tiles: int = 4,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM segmentation: per user recency (last active day), frequency
    (event count), monetary (value micros sum), each quartiled with
    NTILE(``n_tiles``) under a TOTAL order (metric desc for best-first,
    user_id tie-break — no float, no instability), plus the packed
    ``segment`` code r*100 + f*10 + m (1 = best tile).

    Scale note: NTILE is a single global window (one sort of n_users
    rows — the REPORT shape, fine for a per-user summary that is ~10^-6 of
    the event volume).  At 10^12-user scale swap the exact NTILE for
    percentile cutpoints computed on a sample and broadcast — documented
    trade, same output schema.
    """
    day = (_epoch_us(ts_col) / F.lit(86_400_000_000)).cast("long")
    per_user = (
        events.select(
            F.col(user_col).alias("user_id"),
            day.alias("day"),
            F.round(F.col(value_col) * 1e6).cast("long").alias("vm"),
        )
        .groupBy("user_id")
        .agg(
            F.max("day").alias("recency_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("vm").alias("monetary_micros"),
        )
    )
    wr = Window.orderBy(F.col("recency_day").desc(), F.col("user_id").asc())
    wf = Window.orderBy(F.col("frequency").desc(), F.col("user_id").asc())
    wm = Window.orderBy(F.col("monetary_micros").desc(), F.col("user_id").asc())
    return per_user.select(
        "user_id",
        "recency_day",
        "frequency",
        "monetary_micros",
        F.ntile(n_tiles).over(wr).cast("long").alias("r_tile"),
        F.ntile(n_tiles).over(wf).cast("long").alias("f_tile"),
        F.ntile(n_tiles).over(wm).cast("long").alias("m_tile"),
    ).withColumn(
        "segment",
        (F.col("r_tile") * 100 + F.col("f_tile") * 10 + F.col("m_tile")).cast(
            "long"
        ),
    )


def outlier_events(
    events: DataFrame,
    k_sigma: int = 3,
    group_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Events whose value is a > ``k_sigma``-sigma outlier WITHIN its group
    (population sigma), decided by EXACT integer arithmetic — no float mean
    or stddev anywhere, so the flag set is bit-stable and cross-engine
    hash-matchable.

    The z-test is cross-multiplied into integers: with x = value millis,
    n/Sx/Sxx the group count and (square) sums,

        |x - mean| > k*sigma   ⇔   n*(n*x - Sx)^2 > k^2 * n * (n*Sxx - Sx^2)
                               ⇔   (n*x - Sx)^2 > k^2 * (n*Sxx - Sx^2)

    evaluated in DECIMAL(38,0) (HUGEINT in the oracle) — exact up to 38
    digits, far beyond the ~1e22 magnitudes here.  Execution: one
    map-side-combined groupBy for the moments (decimal sums), a broadcast
    join back onto the scan (groups are few), and a pure-column predicate.
    """
    x = F.round(F.col(value_col) * 1e3).cast("long")
    base = events.withColumn("__x__", x)
    mom = base.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum(F.col("__x__").cast("decimal(38,0)")).alias("sx"),
        F.sum(
            (F.col("__x__").cast("decimal(38,0)") * F.col("__x__").cast("decimal(38,0)"))
        ).alias("sxx"),
    )
    j = base.join(F.broadcast(mom), group_col)
    dev = F.col("n") * F.col("__x__").cast("decimal(38,0)") - F.col("sx")
    lhs = dev * dev
    rhs = F.lit(k_sigma * k_sigma).cast("decimal(38,0)") * (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        j.where(lhs > rhs)
        .select(
            F.col("event_id"),
            F.col(group_col),
            F.col("__x__").alias("value_milli"),
            # n*x - Sx fits comfortably in int64 (n ~ 1e5 groups x value
            # millis ~ 1e6 → ~1e11); only the SQUARED terms need decimal
            dev.cast("long").alias("dev_scaled"),
        )
    )


def cusum_changepoints(
    events: DataFrame,
    ts_col: str = "ts",
    type_col: str = "event_type",
    bucket_us: int = 3_600_000_000,
    threshold_mult: int = 5,
    k: int | None = None,
    h: int | None = None,
) -> DataFrame:
    """One-sided CUSUM rate-shift detector per event type over fixed time
    buckets (Page 1954): with x_t the bucket count and k the per-type
    expected rate (total div #buckets — integer), the classic recurrence
    C_t = max(0, C_{t-1} + x_t - k) is rewritten windowed-exact as
    C_t = S_t - min(0, min_{j<=t} S_j) over the prefix sums S of (x - k)
    — the max-reset recurrence equals the prefix sum minus its running
    minimum, so TWO window passes replace the sequential scan and the
    whole detector is integer arithmetic end to end (cross-engine exact).

    Returns (event_type, bucket, n_events, cusum, is_alarm) for every
    bucket in the DENSIFIED per-type range (empty buckets count 0 —
    silence is evidence under CUSUM); is_alarm = cusum > threshold_mult*k.

    Scale shape: one exchange for the bucket counts, one broadcast-size
    min/max relation exploded to the dense bucket axis, one window
    exchange keyed by event_type.  Buckets per key are bounded by the
    observation window, not the event volume."""
    us = _epoch_us(ts_col)
    b = events.select(
        F.col(type_col).alias("event_type"), us.alias("ts_us")
    ).select("event_type", F.expr(f"ts_us div {bucket_us}").alias("bucket"))
    counts = b.groupBy("event_type", "bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    span = counts.groupBy("event_type").agg(
        F.min("bucket").alias("b0"), F.max("bucket").alias("b1")
    )
    dense = span.select(
        "event_type", F.explode(F.sequence("b0", "b1")).alias("bucket")
    )
    x = dense.join(counts, ["event_type", "bucket"], "left").select(
        "event_type", "bucket", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    wo = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # k/h override: the streaming twin (streaming/cusum_stream.py) cannot
    # derive k from "the whole dataset" — equivalence tests pin them
    with_k = x.withColumn(
        "k",
        F.lit(k).cast("long")
        if k is not None
        else F.expr(
            "SUM(n_events) OVER (PARTITION BY event_type)"
            " div COUNT(*) OVER (PARTITION BY event_type)"
        ),
    )
    s = with_k.withColumn("s", F.sum(F.col("n_events") - F.col("k")).over(wo))
    c = s.withColumn(
        "cusum", F.col("s") - F.least(F.lit(0).cast("long"), F.min("s").over(wo))
    )
    return c.select(
        "event_type",
        "bucket",
        "n_events",
        F.col("cusum").cast("long").alias("cusum"),
        (
            F.col("cusum") > (F.lit(h) if h is not None else F.col("k") * threshold_mult)
        ).alias("is_alarm"),
    )


def gap_regularity(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    min_gaps: int = 4,
    cv2_ppm_threshold: int = 250_000,
) -> DataFrame:
    """Inter-event-time regularity profile per user — the classic bot /
    automation signal: scripted clients fire on near-fixed intervals, so the
    squared coefficient of variation CV^2 = Var(gap)/Mean(gap)^2 of their
    inter-event gaps collapses toward 0, while organic humans sit near (or
    above, for bursty sessions) the exponential baseline CV^2 = 1.

    Everything is EXACT integer arithmetic so the DuckDB oracle hash-matches:
    gaps are microsecond-epoch differences (BIGINT); with n/Sx/Sxx the gap
    count and (square) sums, the population-variance numerator is
    V = n*Sxx - Sx^2 and

        cv2_ppm = floor(1e6 * V / Sx^2)        (CV^2 = V/Sx^2 exactly)

    evaluated in DECIMAL(38,0) (HUGEINT oracle-side) — Sx^2 alone can pass
    int64 at ~1e3 gaps x month-long microsecond spans.  Sx = 0 (all gaps
    zero) is declared perfectly regular (cv2_ppm = 0) rather than 0/0.

    Scale shape: ONE exchange (hash by user) shared by the lag window and
    the aggregate — the grouping key equals the window partition key, so
    Catalyst plans no second shuffle.  Per-user state is one lag row; no
    driver-side anything.  min_gaps drops users too short to score.
    """
    us = _epoch_us(ts_col)
    w = Window.partitionBy("user_id").orderBy("ts_us", id_col)
    g = (
        events.select(
            F.col(user_col).alias("user_id"), us.alias("ts_us"), F.col(id_col)
        )
        .withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
        .where(F.col("gap").isNotNull())
    )
    gd = F.col("gap").cast("decimal(38,0)")
    agg = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gaps"),
            F.sum("gap").cast("long").alias("sum_gap_us"),
            F.min("gap").cast("long").alias("min_gap_us"),
            F.max("gap").cast("long").alias("max_gap_us"),
            F.sum(gd * gd).alias("sxx"),
        )
        .where(F.col("n_gaps") >= min_gaps)
    )
    cv2 = F.when(
        F.col("sum_gap_us") > 0,
        F.expr(
            "CAST(1000000 AS DECIMAL(38,0))"
            " * (CAST(n_gaps AS DECIMAL(38,0)) * sxx"
            "    - CAST(sum_gap_us AS DECIMAL(38,0)) * CAST(sum_gap_us AS DECIMAL(38,0)))"
            " div (CAST(sum_gap_us AS DECIMAL(38,0)) * CAST(sum_gap_us AS DECIMAL(38,0)))"
        ),
    ).otherwise(F.lit(0))
    return agg.select(
        "user_id",
        "n_gaps",
        F.expr("sum_gap_us div n_gaps").alias("mean_gap_us"),
        "min_gap_us",
        "max_gap_us",
        cv2.cast("long").alias("cv2_ppm"),
        (cv2.cast("long") < F.lit(cv2_ppm_threshold)).alias("is_regular"),
    )


def km_survival(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    unit_us: int = 3_600_000_000,
) -> DataFrame:
    """Kaplan-Meier curve (Kaplan & Meier 1958) of TIME-TO-NEXT-EVENT with
    right-censoring, exact-integer end to end: every inter-event gap inside a
    user's stream is an OBSERVED duration (the user did come back, after
    gap div unit_us units); each user's final open gap — last event to the
    global horizon max(ts) — is right-CENSORED (they had not returned when
    observation stopped).  This is the classical product-limit treatment of
    return-time data; ignoring the censored tails (naive mean gap) biases
    return-time estimates low.

    The curve at each distinct duration t carries n_at_risk (observations
    with duration >= t), n_events d_t, n_censored c_t, and the product-limit
    estimate as the floor-ppm recurrence

        s_0 = 1_000_000;   s_t = floor(s_prev * (n_t - d_t) / n_t)

    applied at EVERY curve row in duration order (rows with d_t = 0 are
    exact no-ops: floor(s*n/n) = s), so the DuckDB recursive-CTE replay is
    bit-identical — no float product, no exp/ln anywhere.

    Scale shape: one exchange (hash by user, shared by the lag window and
    the per-user max) to build observations, one map-side-combined groupBy
    onto the duration axis.  The sequential product-limit fold runs over the
    AGGREGATED curve — bounded by #distinct duration units (the observation
    window), not the event count — inside one JVM ``aggregate()`` over a
    collect_list'd array: constant-size state, zero Python, never on the
    driver.  s*(n-d) <= 1e6 * n stays in BIGINT to ~9e12 observations.
    """
    us = _epoch_us(ts_col)
    ev = events.select(F.col(user_col).alias("user_id"), us.alias("ts_us"))
    horizon = ev.agg(F.max("ts_us").alias("h0"))
    w = Window.partitionBy("user_id").orderBy("ts_us")
    gaps = (
        ev.withColumn("gap", F.col("ts_us") - F.lag("ts_us").over(w))
        .where(F.col("gap").isNotNull())
        .select(
            F.expr(f"gap div {unit_us}").alias("duration"),
            F.lit(1).cast("long").alias("observed"),
        )
    )
    tails = (
        ev.groupBy("user_id")
        .agg(F.max("ts_us").alias("last_us"))
        .crossJoin(F.broadcast(horizon))
        .select(
            F.expr(f"(h0 - last_us) div {unit_us}").alias("duration"),
            F.lit(0).cast("long").alias("observed"),
        )
    )
    lab = gaps.unionAll(tails)
    curve = lab.groupBy("duration").agg(
        F.sum("observed").cast("long").alias("d"),
        F.sum(F.lit(1) - F.col("observed")).cast("long").alias("c"),
    )
    wo = Window.orderBy("duration").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    at_risk = curve.select(
        "duration",
        (
            F.sum(F.col("d") + F.col("c")).over(tot)
            - F.sum(F.col("d") + F.col("c")).over(wo)
            + F.col("d")
            + F.col("c")
        ).cast("long").alias("n"),
        "d",
        "c",
    )
    # product-limit fold: one row in, array of curve rows out — JVM higher-
    # order functions only (sort_array on struct sorts by leading field)
    arr = at_risk.agg(
        F.collect_list(F.struct("duration", "n", "d", "c")).alias("rows")
    )
    folded = arr.select(
        F.explode(
            F.expr(
                """
aggregate(
  sort_array(rows),
  struct(
    CAST(1000000 AS BIGINT) AS s,
    CAST(array() AS array<struct<
      duration_unit: bigint, n_at_risk: bigint, n_events: bigint,
      n_censored: bigint, survival_ppm: bigint>>) AS out),
  (acc, x) -> struct(
    (acc.s * (x.n - x.d)) div x.n AS s,
    concat(acc.out, array(struct(
      x.duration AS duration_unit, x.n AS n_at_risk, x.d AS n_events,
      x.c AS n_censored, (acc.s * (x.n - x.d)) div x.n AS survival_ppm))) AS out),
  acc -> acc.out)
"""
            )
        ).alias("r")
    )
    return folded.select("r.*")


def burst_stats(
    events: DataFrame,
    window_us: int = 3_600_000_000,
    user_col: str = "user_id",
    ts_col: str = "ts",
    burst_threshold: int = 50,
) -> DataFrame:
    """Per-user peak burst rate: the maximum number of events inside ANY
    trailing ``window_us`` window (evaluated at event granularity — the
    exact sliding-window maximum, not a fixed-bucket approximation, since a
    burst straddling two buckets halves in a tumbling count).  The classic
    rate-limit / scraping signal.

    For each event, a RANGE window frame [t - window_us, t] keyed by user
    counts the trailing events; the per-user MAX of that count is the peak.
    Exact integers end to end; ``is_burst`` = peak > burst_threshold.

    Scale shape: ONE exchange (hash by user) shared by the range window and
    the final aggregate; the range frame is a two-pointer scan within each
    sorted user partition — linear, no self-join quadratics (the naive
    "count events within 1h of each event" theta-join explodes on exactly
    the bursty users this flags).
    """
    us = _epoch_us(ts_col)
    base = events.select(F.col(user_col).alias("user_id"), us.alias("ts_us"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-int(window_us), 0)
    )
    c = base.withColumn("trail", F.count(F.lit(1)).over(w))
    return (
        c.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.max("trail").cast("long").alias("peak_burst"),
        )
        .select(
            "user_id",
            "n_events",
            "peak_burst",
            (F.col("peak_burst") > burst_threshold).alias("is_burst"),
        )
    )


def gap_fill_daily(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Densify each user's activity to a complete daily spine and forward-
    fill (LOCF): (user_id, day, n_obs, filled, days_since_obs) for EVERY day
    between the user's first and last event — n_obs the day's exact event
    count (0 on gap days), ``filled`` the most recent observed day's count
    carried forward, ``days_since_obs`` the staleness of that carry.

    The densify-then-LOCF idiom every panel/feature pipeline needs (training
    snapshots, churn features, balance histories): downstream windows over
    the dense panel see every calendar day, not just active ones.

    Days are integer epoch-days (timezone-free ``_epoch_us div 86400e6``),
    so every column is exact BIGINT and the DuckDB oracle replays it
    bit-for-bit.

    Scale shape: one groupBy(user, day) with map-side combine, one
    groupBy(user) for the [min, max] span, a ``sequence()`` explode that
    generates the spine DISTRIBUTED (rows appear only in the user's own
    partition — no driver-side calendar, no cross join against a global
    date dimension), then one window over the shared (user, day) sort.  Two
    exchanges total; spine length is bounded by the observation span, not
    by |users| x |calendar|.
    """
    us = _epoch_us(ts_col)
    # integer epoch-day: `div` (not float /) keeps it exact at any horizon
    base = events.select(
        F.col(user_col).alias("user_id"), us.alias("_us")
    ).select("user_id", F.expr("CAST(_us div 86400000000 AS BIGINT)").alias("day"))
    daily = base.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).cast("long").alias("n_obs")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = span.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    dense = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = F.last("n_obs", ignorenulls=True).over(w)
    last_day = F.last(
        F.when(F.col("n_obs").isNotNull(), F.col("day")), ignorenulls=True
    ).over(w)
    return dense.select(
        "user_id",
        "day",
        F.coalesce("n_obs", F.lit(0)).cast("long").alias("n_obs"),
        filled.cast("long").alias("filled"),
        (F.col("day") - last_day).cast("long").alias("days_since_obs"),
    )
