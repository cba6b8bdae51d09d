"""Classic relational OLAP over the warehouse tables (TPC-H-shaped): the
star-schema rollups an analytics engine must do WELL alongside the graph
and pipeline layers.

The plan story is the point: dimension tables (nation, region) are
BROADCAST — no shuffle for their joins; the fact-side joins (lineitem ->
orders -> customer) hash-exchange on their keys once each; the final
rollup is a partial-aggregated groupBy over a handful of (region, nation)
cells.  At 100 TB the lineitem scan dominates and everything else is
either broadcast or map-side combined — the shape Catalyst's join
reordering + AQE keeps optimal without hand-scheduling.

Money stays exact: revenue per row is round((price * (1 - discount)) *
1e6) as BIGINT micros — one fixed-association IEEE product (deterministic
cross-engine; the sessionize value-micros discipline), then pure integer
sums.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def revenue_rollup(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """(region_name, nation_name, n_lineitems, revenue_micros): discounted
    lineitem revenue rolled up to the customer's nation and region — the
    TPC-H Q5 family restated with exact integer money."""
    rev = F.expr(
        "CAST(ROUND((l_extendedprice * (1.0 - l_discount)) * 1000000) AS BIGINT)"
    )
    li = lineitem.select("l_orderkey", rev.alias("rev_micros"))
    od = orders.select("o_orderkey", "o_custkey")
    cu = customer.select("c_custkey", "c_nationkey")
    na = nation.select("n_nationkey", "n_name", "n_regionkey")
    re = region.select("r_regionkey", "r_name")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .join(F.broadcast(na), cu.c_nationkey == na.n_nationkey)
        .join(F.broadcast(re), na.n_regionkey == re.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name"))
        .agg(
            F.count(F.lit(1)).alias("n_lineitems"),
            F.sum("rev_micros").alias("revenue_micros"),
        )
    )


def revenue_cube(orders: DataFrame) -> DataFrame:
    """(status, priority, order_year, gid, n_orders, total_micros) — the
    FULL CUBE over (order status, priority, order year) with exact integer
    money: every 2³ = 8 grouping-set combination in one pass.

    gid is the standard grouping id (first dim = most significant bit:
    status·4 + priority·2 + year·1, bit set = dim rolled up), which keeps
    rolled-up cells distinguishable from a hypothetical literal 'ALL'
    value.  Spark computes the cube with ONE Expand + one map-side-combined
    aggregate (no 8-way union of scans); at 100 TB the Expand multiplies
    rows 8x BEFORE the partial aggregate collapses them per map task, so
    the exchange carries at most 8·|groups| rows per task, not 8·|input| —
    the reason CUBE beats unioning 8 GROUP BYs on a fact table."""
    o = orders.select(
        "o_orderstatus",
        "o_orderpriority",
        F.year("o_orderdate").cast("long").alias("order_year"),
        F.expr("CAST(ROUND(o_totalprice * 1000000) AS BIGINT)").alias("micros"),
    )
    return (
        o.cube("o_orderstatus", "o_orderpriority", "order_year")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum("micros").alias("total_micros"),
            F.grouping_id().cast("long").alias("gid"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("order_year", F.lit(-1)).cast("long").alias("order_year"),
            "gid",
            "n_orders",
            "total_micros",
        )
    )


def association_rules(
    baskets: DataFrame,
    basket_col: str = "basket_id",
    item_col: str = "item",
    min_pairs: int = 5,
    max_basket: int = 1000,
) -> DataFrame:
    """Market-basket association rules over (basket, item) rows:
    (antecedent, consequent, pair_n, support_ppm, confidence_ppm,
    lift_ppm) for every DIRECTED item pair co-occurring in >= ``min_pairs``
    baskets.  All three metrics are floor-scaled parts-per-million BIGINTs
    (pure integer division), so the result is bit-stable and hash-matchable
    cross-engine:

    - support_ppm    = 1e6 * pair_n // n_baskets
    - confidence_ppm = 1e6 * pair_n // antecedent_n
    - lift_ppm       = 1e6 * pair_n * n_baskets // (antecedent_n * consequent_n)

    Execution: one distinct (basket, item) scan, one self-join per basket
    key for the pair counts (map-side combined groupBy), two broadcast-able
    item-frequency joins, and a single 1-row collect for n_baskets
    (constant size).  Pair volume is quadratic in basket SIZE, so baskets
    larger than ``max_basket`` items are excluded up front (the standard
    truncation for degenerate mega-baskets; at TPC-H shape baskets are
    ~4-7 items and nothing is dropped).  n_baskets counts the post-cap
    basket universe so the three ppm metrics stay mutually consistent.
    """
    b = (
        baskets.select(
            F.col(basket_col).alias("basket"), F.col(item_col).alias("item")
        )
        .distinct()
    )
    ok = (
        b.groupBy("basket")
        .agg(F.count(F.lit(1)).alias("sz"))
        .where(F.col("sz") <= max_basket)
        .select("basket")
    )
    b = b.join(ok, "basket", "left_semi")
    n_baskets = b.select("basket").distinct().count()
    item_n = b.groupBy("item").agg(F.count(F.lit(1)).alias("item_n"))
    lhs = b.select("basket", F.col("item").alias("antecedent"))
    rhs = b.select("basket", F.col("item").alias("consequent"))
    pairs = (
        lhs.join(rhs, "basket")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .where(F.col("pair_n") >= min_pairs)
    )
    M = F.lit(1000000).cast("long")
    return (
        pairs.join(
            item_n.select(F.col("item").alias("antecedent"), F.col("item_n").alias("a_n")),
            "antecedent",
        )
        .join(
            item_n.select(F.col("item").alias("consequent"), F.col("item_n").alias("c_n")),
            "consequent",
        )
        .select(
            "antecedent",
            "consequent",
            "pair_n",
            F.expr(f"CAST(1000000 * pair_n AS BIGINT) DIV {n_baskets}").alias(
                "support_ppm"
            ),
            (M * F.col("pair_n")).cast("long").alias("_cp"),
            "a_n",
            "c_n",
        )
        .select(
            "antecedent",
            "consequent",
            "pair_n",
            "support_ppm",
            F.expr("_cp DIV a_n").alias("confidence_ppm"),
            F.expr(
                f"CAST(1000000 * pair_n * CAST({n_baskets} AS BIGINT) AS BIGINT)"
                " DIV (a_n * c_n)"
            ).alias("lift_ppm"),
        )
    )
