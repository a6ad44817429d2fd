from __future__ import annotations

import decimal

import duckdb
import pytest

from evm_indexer_spark.session import get_spark
from evm_indexer_spark.sources.fixtures import fixture_pools, generate_evm_fixtures
from evm_indexer_spark.sources.tables import load_evm_tables

N_FIXTURE_BLOCKS = 300
BASE_TIME = 1_600_000_000


@pytest.fixture(scope="session")
def spark():
    s = get_spark("evm-indexer-spark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def evm_dir(tmp_path_factory) -> str:
    d = tmp_path_factory.mktemp("evm_fixtures")
    counts = generate_evm_fixtures(str(d), n_blocks=N_FIXTURE_BLOCKS)
    assert counts["blocks"] > 0 and counts["transactions"] > 0 and counts["events"] > 0
    return str(d)


@pytest.fixture(scope="session")
def evm(spark, evm_dir):
    return load_evm_tables(spark, evm_dir)


@pytest.fixture(scope="session")
def pools():
    return fixture_pools()


@pytest.fixture(scope="session")
def duck(evm_dir):
    con = duckdb.connect()
    for t in ["blocks", "transactions", "events"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{evm_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def _norm_cell(v):
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    return v


def normalize_rows(cols, rows):
    # None is not orderable against str/int in tuple sort; key on
    # (is_null, repr-class, value) per cell so mixed-null rows sort
    # deterministically (the driver's pandas sort puts NA last the
    # same way).
    def key(row):
        return tuple(
            (v is None, type(v).__name__, "" if v is None else v) for v in row
        )

    return sorted(
        (tuple(_norm_cell(v) for v in row) for row in rows), key=key
    ), list(cols)


def assert_matches_oracle(spark_df, duck_con, sql: str):
    """Order-insensitive value comparison of a Spark plan vs DuckDB SQL."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = duck_con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    assert [c.lower() for c in s_cols] == [c.lower() for c in d_cols], (
        f"column mismatch: spark={s_cols} duck={d_cols}"
    )
    s_norm, _ = normalize_rows(s_cols, s_rows)
    d_norm, _ = normalize_rows(d_cols, d_rows)
    assert len(s_norm) == len(d_norm), (
        f"row count mismatch: spark={len(s_norm)} duck={len(d_norm)}"
    )
    assert s_norm == d_norm
