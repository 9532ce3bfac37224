"""Mimics the driver's correctness gate: run each queries() entry and its
oracle_sql() on the same parquet tables; compare row count + column names +
order-insensitive values.
"""

import math
import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(4)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(got: pd.DataFrame, want: pd.DataFrame, name: str):
    assert sorted(got.columns) == sorted(want.columns), (
        f"{name}: columns {sorted(got.columns)} vs {sorted(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} vs {len(want)}"
    g, w = _canon(got), _canon(want)
    if not g.equals(w):
        diff_mask = ~(g.eq(w) | (g.isna() & w.isna()))
        bad = diff_mask.any(axis=1)
        raise AssertionError(
            f"{name}: value mismatch\nGOT:\n{g[bad].head(5)}\nWANT:\n{w[bad].head(5)}"
        )


SQL_CHECKED = sorted(entry_mod.oracle_sql())


@pytest.mark.spark
@pytest.mark.parametrize("name", SQL_CHECKED)
def test_query_vs_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got = q(spark, SF_DIR).toPandas()
    want = duck.execute(entry_mod.oracle_sql()[name]).df()
    compare(got, want, name)


@pytest.mark.spark
def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    for name in sorted(set(qs) - set(entry_mod.oracle_sql())):
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name
        assert df.columns, name


@pytest.mark.spark
def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "conv_id",
        "session_start",
        "session_end",
        "n_turns",
        "text_bytes",
        "n_errors",
    }
    assert all(r["n_errors"] == 0 for r in rows)
