"""Drive the driver contract the way the grading driver does: fresh process,
entry() smoke, every queries() entry executed, every oracle_sql() entry
compared value-exactly against DuckDB at sf0.01.

Usage: python scripts/verify_contract.py [query ...]   (no args = full sweep)
"""

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

import __spark_entry__ as m  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def compare(name: str, spdf: pd.DataFrame, dpdf: pd.DataFrame) -> str:
    s, d = norm(spdf), norm(dpdf)
    if len(s) != len(d):
        return f"ROWS {len(s)} vs {len(d)}"
    if list(s.columns) != list(d.columns):
        return f"SCHEMA {list(s.columns)} vs {list(d.columns)}"
    for c in s.columns:
        a, b = s[c], d[c]
        if a.dtype.kind in "fc" or b.dtype.kind in "fc":
            if not np.allclose(a.astype(float), b.astype(float), atol=0, rtol=0, equal_nan=True):
                bad = (~np.isclose(a.astype(float), b.astype(float), atol=0, rtol=0, equal_nan=True)).idxmax()
                return f"VALUES col={c} row{bad}: {a[bad]!r} vs {b[bad]!r}"
        else:
            aa = a.astype(str).where(~a.isna(), "<null>")
            bb = b.astype(str).where(~b.isna(), "<null>")
            if not (aa == bb).all():
                bad = (aa != bb).idxmax()
                return f"VALUES col={c} row{bad}: {a[bad]!r} vs {b[bad]!r}"
    return "ok"


def main() -> int:
    only = set(sys.argv[1:])
    # vanilla session on purpose — the grading gate runs one (no Arrow
    # configs), which is exactly where round 1's Row-vs-dict crash hid
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("verify-contract")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = m.entry(spark).collect()
    assert len(rows) > 0, "entry() smoke failed"
    print(f"entry() smoke: {len(rows)} rows ok")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")

    # gate entries first (what the driver records), then the demoted extras —
    # the local twin checks BOTH so demotion never hides a regression
    oracles = {**m.oracle_sql(), **m.extra_oracle_sql()}
    failures = []
    for name, fn in m.all_queries().items():
        if only and name not in only:
            continue
        try:
            spdf = fn(spark, SF_DIR).toPandas()
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"{name:28s} CRASH {type(e).__name__}: {e}")
            continue
        if name in oracles:
            dpdf = con.sql(oracles[name]).df()
            verdict = compare(name, spdf, dpdf)
            if verdict != "ok":
                failures.append(name)
            print(f"{name:28s} {len(spdf):6d} rows  oracle:{verdict}")
        else:
            tag = "rows-only" if len(spdf) > 0 else "rows-only EMPTY(!)"
            if len(spdf) == 0:
                failures.append(name)
            print(f"{name:28s} {len(spdf):6d} rows  {tag}")
    print(f"\n{'FAIL: ' + ', '.join(failures) if failures else 'ALL GREEN'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
