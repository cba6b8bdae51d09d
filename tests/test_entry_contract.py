"""Self-check of the driver contract: run every queries() entry on Spark and
its oracle_sql() on DuckDB at sf0.01, compare row count, column names, and an
order-insensitive value hash — mirroring the driver's CORRECTNESS gate."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_DIR_CORRECTNESS

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf[sorted(pdf.columns)].copy()
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif "float" in str(pdf[c].dtype):
            pdf[c] = pdf[c].round(6)
        elif "int" in str(pdf[c].dtype).lower():
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(list(pdf.columns)).reset_index(drop=True)


ORACLE_KEYS = sorted(entrymod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, name):
    q = entrymod.queries()[name]
    got = _normalize(q(spark, SF_DIR_CORRECTNESS).toPandas())
    con = _duck(SF_DIR_CORRECTNESS)
    exp = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (got.columns, exp.columns)
    assert len(got) == len(exp), f"row count {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


def test_rows_only_queries_run(spark):
    oracles = set(entrymod.oracle_sql())
    for name, q in entrymod.queries().items():
        if name in oracles:
            continue
        df = q(spark, SF_DIR_CORRECTNESS)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert {"bucket", "n_edges", "n_replicas", "rf", "s_v", "s_e"} <= set(pdf.columns)
