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
