"""End-to-end integration: raw landing docs → streaming ingest →
bucket store → historical query catalog → REST facade JSON."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.api import RestFacade
from evm_indexer_spark.operators.historical import HistoricalQueries
from evm_indexer_spark.sources.rawgen import raw_block_doc, write_landing_files
from evm_indexer_spark.streaming.ingest import start_ingest_stream
from evm_indexer_spark.streaming.store import BlockStore

N_BLOCKS = 120


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("e2e")
    landing = str(root / "landing")
    write_landing_files(landing, N_BLOCKS, n_files=4)
    s = BlockStore(spark, str(root / "store"))
    q = start_ingest_stream(spark, landing, s, str(root / "ckpt"))
    q.awaitTermination(180)
    return s


@pytest.fixture(scope="module")
def queries(store):
    return HistoricalQueries(store.blocks(), store.transactions(), store.events())


def test_ingested_counts(store):
    assert store.blocks().count() == N_BLOCKS
    assert store.transactions().count() == N_BLOCKS * 3
    assert store.events().count() == N_BLOCKS * 6


def test_historical_over_ingested_store(queries):
    # rawgen: block n has 3 txs; every (n+t) % 20 == 0 tx creates a contract
    assert queries.get_transaction_count_by_block_number(7).collect()[0][0] == 3
    blk = queries.get_block_by_number(42).collect()[0]
    assert blk["hash"] == f"0x{42:064x}"
    assert blk["gaslimit"] == 30_000_000
    # last-x events ordered by descending block number
    ev = queries.get_last_x_events_from_contract(f"0x{0:040x}", 5).collect()
    assert len(ev) == 5


def test_facade_over_ingested_store(queries):
    fc = RestFacade(queries)
    out = fc.block({"number": "9", "tx": "yes"})
    assert len(out["transactions"]) == 3
    # creation tx at n+t ≡ 0 (mod 20): block 20, t=0
    tx = fc.transaction({"hash": f"0x{20:032x}{0:032x}"})
    assert "contract" in tx and "to" not in tx
    ev = fc.event({"blockHash": f"0x{3:064x}"})
    assert {e["index"] for e in ev["events"]} == {0, 1, 2, 3, 4, 5}
    # topic0 filter: all logs share the same sig in rawgen
    filtered = fc.event(
        {
            "contract": f"0x{1:040x}",
            "fromBlock": "0",
            "toBlock": "99",
            "topic0": "0x" + "dd" * 32,
        }
    )
    assert len(filtered["events"]) == 100 * 3  # one log idx 1 per tx in range


def test_depth_gate_over_ingested_store(store):
    from evm_indexer_spark.streaming.ingest import confirmed_blocks

    confirmed = confirmed_blocks(store.blocks(), depth=20)
    assert confirmed.agg(F.max("number")).collect()[0][0] == N_BLOCKS - 1 - 20
