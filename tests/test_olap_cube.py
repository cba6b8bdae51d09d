"""revenue_cube: grouping-set algebra invariants at sf0.001 — every rollup
cell equals the sum of its children, the grand total appears exactly once,
and gid encodes exactly which dims are rolled up."""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_revenue_cube_identities(spark):
    from split_merge_partitioner_spark.functions.olap import revenue_cube

    pdf = revenue_cube(spark.read.parquet(f"{SF_DIR}/orders.parquet")).toPandas()
    base = pdf[pdf.gid == 0]
    grand = pdf[pdf.gid == 7]
    assert len(grand) == 1
    assert grand.iloc[0]["n_orders"] == base["n_orders"].sum()
    assert grand.iloc[0]["total_micros"] == base["total_micros"].sum()
    assert (grand.iloc[0][["status", "priority", "order_year"]].tolist()
            == ["ALL", "ALL", -1])
    # gid bit <-> rolled-up sentinel, per row
    for _, r in pdf.iterrows():
        assert (r["status"] == "ALL") == bool(r["gid"] & 4)
        assert (r["priority"] == "ALL") == bool(r["gid"] & 2)
        assert (r["order_year"] == -1) == bool(r["gid"] & 1)
    # every single-dim marginal equals the base cells it covers
    by_status = pdf[pdf.gid == 3].set_index("status")["total_micros"]
    for s, v in base.groupby("status")["total_micros"].sum().items():
        assert by_status[s] == v
    # 8 grouping sets present
    assert sorted(pdf.gid.unique()) == list(range(8))
