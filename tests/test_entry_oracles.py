"""Mini-driver: run every oracle-checked queries() entry on Spark AND its
oracle_sql() twin on DuckDB at sf0.01, compare row count, column names, and
order-insensitive values — the same gate CORRECTNESS_r{N}.json applies."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"


def _duck():
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return round(v, 9)
    return v


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(_norm_cell(r[i]) for i in idx) for r in rows
    )


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.sql(entry_mod.oracle_sql()[name])
    d_cols = res.columns
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), (
        f"{name}: columns {sorted(s_cols)} != {sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"{name}: rowcount {len(s_rows)} != {len(d_rows)}"
    )
    ns, nd = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    mismatches = [(a, b) for a, b in zip(ns, nd) if a != b]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "doc_id" in df.columns


ROWS_ONLY = [k for k in entry_mod.queries() if k not in entry_mod.oracle_sql()]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
