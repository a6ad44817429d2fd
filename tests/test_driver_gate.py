"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its oracle_sql() twin via DuckDB
with the driver's registered views — catches alias/type/value drift
before the real per-round gate does (the driver runs sf0.01)."""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

from .conftest import normalize_rows

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


@pytest.fixture(scope="module")
def duck_sf():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0 and len(df.schema) > 0


def test_oracle_keys_subset():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query(name, spark, duck_sf):
    df = QUERIES[name](spark, SF_DIR)
    rows = [tuple(r) for r in df.collect()]
    sql = ORACLES.get(name)
    if sql is None:
        # rows-only check, mirroring the driver's weaker gate
        assert isinstance(rows, list)
        return
    rel = duck_sf.sql(sql)
    d_cols, d_rows = rel.columns, rel.fetchall()
    assert [c.lower() for c in df.columns] == [c.lower() for c in d_cols], (
        f"{name}: column mismatch spark={df.columns} duck={d_cols}"
    )
    s_norm, _ = normalize_rows(df.columns, rows)
    d_norm, _ = normalize_rows(d_cols, d_rows)
    assert len(s_norm) == len(d_norm), (
        f"{name}: rows spark={len(s_norm)} duck={len(d_norm)}"
    )
    assert s_norm == d_norm, f"{name}: value mismatch"
