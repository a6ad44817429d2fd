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


def test_registry_fully_covered_by_gate_replica():
    """Every registered query must appear — green — in the newest
    committed gate-replica artifact (tools/gate_replica.py output).
    The driver's own CORRECTNESS file is frozen at 50 rows, so entries
    past q64 are verified ONLY by the replica ritual; this test makes
    a new registration that skipped the ritual a pytest failure
    instead of a silent gate dodge. Regenerate with
    ``python tools/gate_replica.py`` and commit the artifact as
    ``GATE_REPLICA_r<N>.json`` after any registry-touching change."""
    import json
    import re

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    best, best_round = None, -1
    for f in os.listdir(repo):
        m = re.fullmatch(r"GATE_REPLICA_r(\d+)\.json", f)
        if m and int(m.group(1)) > best_round:
            best, best_round = f, int(m.group(1))
    assert best is not None, "no committed GATE_REPLICA_r<N>.json found"
    with open(os.path.join(repo, best)) as fh:
        replica = json.load(fh)
    missing = sorted(set(QUERIES) - set(replica))
    assert not missing, (
        f"{best} does not cover registered queries {missing} — run "
        "tools/gate_replica.py at head and commit the artifact"
    )
    red = sorted(
        k for k, v in replica.items()
        if k in QUERIES
        and not (v.get("rows_match") and v.get("schema_match")
                 and v.get("hash_match"))
    )
    assert not red, f"{best} has non-green entries {red}"


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
