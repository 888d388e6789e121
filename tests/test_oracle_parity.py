"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at sf0.01, compare row count, schema
(column names), and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.dt.strftime("%Y-%m-%d %H:%M:%S")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype(np.float64).round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="stable").reset_index(drop=True)


# gate entries AND demoted extras — demotion out of the driver's 50-row
# window must never hide an oracle regression locally
ALL_QUERIES = entrymod.all_queries()
ALL_ORACLES = {**entrymod.oracle_sql(), **entrymod.extra_oracle_sql()}
SQL_CHECKED = sorted(ALL_ORACLES.keys())


@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_matches_oracle(spark, duck, name):
    q = ALL_QUERIES[name]
    spark_pdf = q(spark, SF_DIR).toPandas()
    duck_pdf = duck.sql(ALL_ORACLES[name]).df()
    a, b = _normalize(spark_pdf), _normalize(duck_pdf)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs oracle {len(b)}"
    assert list(a.columns) == list(b.columns), f"{name}: schema {list(a.columns)} vs {list(b.columns)}"
    if len(a):
        for c in a.columns:
            if pd.api.types.is_float_dtype(a[c]):
                # the driver hashes values EXACTLY; in-query rounding must make
                # both engines produce the identical decimal -> identical double
                ok = np.allclose(a[c].to_numpy(), b[c].to_numpy(), rtol=0, atol=0, equal_nan=True)
            else:
                ok = a[c].equals(b[c])
            assert ok, f"{name}: column {c} differs\n{a[c].head()}\n{b[c].head()}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle entry must still run and return a stable schema."""
    for name, q in ALL_QUERIES.items():
        if name in SQL_CHECKED:
            continue
        df = q(spark, SF_DIR)
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    n = df.count()
    assert n > 0
    assert "image_id" in df.columns and "poly_id" in df.columns
