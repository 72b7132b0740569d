"""Replicates the grading driver: every queries() entry vs its oracle_sql()
twin on DuckDB at sf0.01 — row count, column names, and order-insensitive
value equality."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("Int64")
        else:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


ALL = sorted(entry_mod.queries())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    got = _canon(q(spark, SF).toPandas())
    oracle = entry_mod.oracle_sql().get(name)
    if oracle is None:
        assert len(got) > 0, f"{name}: rows-only check failed (empty result)"
        return
    exp = _canon(duck.execute(oracle).df())
    assert list(got.columns) == list(exp.columns), f"{name} columns"
    assert len(got) == len(exp), f"{name} row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        a, b = got[c], exp[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            aa = pd.to_numeric(a, errors="coerce")
            bb = pd.to_numeric(b, errors="coerce")
            ok = ((aa - bb).abs() < 1e-6) | (aa.isna() & bb.isna())
        else:
            ok = (a == b) | (a.isna() & b.isna())
        assert ok.all(), f"{name}.{c}: first diff at\n{got[~ok].head(3)}\nvs\n{exp[~ok].head(3)}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert {"remote_addr", "cnt", "pct"} <= set(pdf.columns)
