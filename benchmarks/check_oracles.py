#!/usr/bin/env python
"""Local replica of the driver's correctness gate: run every queries() entry
at sf0.01 and compare rows/schema/values against oracle_sql() via DuckDB.

Usage: python benchmarks/check_oracles.py [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name, got: pd.DataFrame, want: pd.DataFrame):
    rows = len(got) == len(want)
    g, w = _canon(got), _canon(want)
    schema = list(g.columns) == list(w.columns) and all(
        str(g[c].dtype) == str(w[c].dtype) for c in g.columns
    )
    vals = rows and schema
    if vals:
        for c in g.columns:
            a, b = g[c], w[c]
            if np.issubdtype(a.dtype, np.floating):
                eq = np.allclose(a.fillna(-9e9), b.fillna(-9e9), rtol=0, atol=0)
            else:
                eq = a.equals(b)
            if not eq:
                vals = False
                bad = (a != b) if not np.issubdtype(a.dtype, np.floating) else ~np.isclose(a.fillna(-9e9), b.fillna(-9e9), rtol=0, atol=0)
                print(f"  !! {name}: column {c} first diffs:")
                print(pd.DataFrame({"got": a[bad].head(3), "want": b[bad].head(3)}))
                break
    if not schema:
        print(f"  !! {name}: schema got={[(c, str(g[c].dtype)) for c in g.columns]}")
        print(f"              want={[(c, str(w[c].dtype)) for c in w.columns]}")
    status = "PASS" if (rows and schema and vals) else "FAIL"
    print(f"{status} {name}: spark={len(got)} oracle={len(want)} rows={rows} schema={schema} vals={vals}")
    return status == "PASS"


def main(names=None) -> int:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('CPUS', '8')}]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs, oracles = E.queries(), E.oracle_sql()
    fails, no_oracle = [], []
    for name, fn in qs.items():
        if names and name not in names:
            continue
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"ERR  {name}: {type(ex).__name__}: {str(ex)[:300]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"----(no oracle) {name}: spark={len(got)}")
            no_oracle.append(name)
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
            )
        try:
            want = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"ERR  {name} (oracle): {type(ex).__name__}: {str(ex)[:300]}")
            fails.append(name)
            continue
        if not compare(name, got, want):
            fails.append(name)
    print(f"\nfails: {fails}\nno_oracle: {no_oracle}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main(set(sys.argv[1:]) or None))
