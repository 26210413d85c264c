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


# driver-visible queries AND the pytest-only extras (redundant-coverage
# variants parked off the driver's 50-row report) get the SAME parity gate
ALL_QUERIES = {**entry_mod.queries(), **entry_mod.extra_queries()}
ALL_ORACLES = {**entry_mod.oracle_sql(), **entry_mod.extra_oracle_sql()}

ORACLE_KEYS = sorted(ALL_ORACLES.keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_oracle_parity(spark, name):
    q = ALL_QUERIES[name]
    sdf = q(spark, SF_DIR)
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.sql(ALL_ORACLES[name])
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


ROWS_ONLY = [k for k in ALL_QUERIES if k not in ALL_ORACLES]


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_every_query_has_oracle():
    """Round-2 verdict #4: a broken oracle generator must fail loudly, not
    silently demote its query to rows-only. Every registered query — driver
    and extra — must have an oracle, and no generator may have raised."""
    assert set(entry_mod.oracle_sql()) == set(entry_mod.queries())
    assert set(entry_mod.extra_oracle_sql()) == set(entry_mod.extra_queries())
    assert entry_mod.DEGRADED_ORACLES == {}, (
        f"oracle generators raised: {list(entry_mod.DEGRADED_ORACLES)}"
    )


def test_driver_registry_within_report_cap():
    """The driver correctness report keeps at most 50 rows; every
    oracle-backed key must sit inside that window."""
    assert len(entry_mod.queries()) <= 50
