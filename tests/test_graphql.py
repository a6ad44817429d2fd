"""GraphQL resolver parity: field map completeness, model conversions
(all numerics stringified), and resolver error strings."""

from __future__ import annotations

import pytest

from evm_indexer_spark.errors import NotFoundError, ValidationError
from evm_indexer_spark.graphql import FIELD_MAP, GraphQLResolvers, fill_up_topic_array
from evm_indexer_spark.operators.historical import HistoricalQueries
from evm_indexer_spark.sources.fixtures import block_hash, tx_hash


@pytest.fixture(scope="module")
def gq(evm):
    return GraphQLResolvers(
        HistoricalQueries(evm["blocks"], evm["transactions"], evm["events"])
    )


def test_field_map_complete(gq):
    for field, method in FIELD_MAP.items():
        assert callable(getattr(gq, method)), f"{field} → {method} missing"
    assert len(FIELD_MAP) == 33  # schema.graphqls:44-139


def test_block_model_stringified(gq):
    b = gq.block_by_number("5")
    assert b["number"] == "5" and b["time"] == "1600000010"
    assert isinstance(b["gasUsed"], str) and isinstance(b["size"], float)


def test_tx_model_both_fields(gq):
    normal = gq.transaction(tx_hash(1, 0))
    assert normal["contract"] == "" and normal["to"].startswith("0x")
    assert normal["gas"].isdigit() and normal["nonce"].isdigit()
    creation = gq.transaction(tx_hash(20, 0))
    assert creation["to"] == "" and creation["contract"].startswith("0x")
    assert creation["state"] in ("0", "1")


def test_event_model_index_string(gq):
    evs = gq.events_by_block_hash(block_hash(3))
    assert all(e["index"].isdigit() for e in evs)


def test_counts_are_ints(gq):
    assert gq.transaction_count_by_block_number("3") == 3
    assert isinstance(gq.transaction_count_by_block_hash(block_hash(3)), int)


def test_topics_padding():
    assert fill_up_topic_array(["0xa"]) == ["0xa", "", "", ""]
    assert fill_up_topic_array(["1", "2", "3", "4"]) == ["1", "2", "3", "4"]


def test_events_with_topics(gq, pools):
    sig = pools["sigs"][2]
    evs = gq.events_from_contract_with_topics_by_number_range(
        pools["contracts"][3], "0", "99", [sig]
    )
    assert evs and all(e["topics"][0] == sig for e in evs)


@pytest.mark.parametrize(
    "method,args,msg",
    [
        ("block_by_hash", ("0x12",), "Bad Block Hash"),
        ("block_by_number", ("x",), "Bad Block Number"),
        ("blocks_by_number_range", ("0", "1000"), "Bad Block Number Range"),
        ("blocks_by_time_range", ("0", "99999"), "Bad Block Timestamp Range"),
        ("transaction", ("nope",), "Bad Transaction Hash"),
        (
            "transaction_count_from_account_by_number_range",
            ("bad", "0", "10"),
            "Bad Account Address",
        ),
        (
            "transactions_between_accounts_by_number_range",
            ("0x" + "a" * 40, "bad", "0", "10"),
            "Bad To Account Address",
        ),
        ("transaction_from_account_with_nonce", ("0x" + "a" * 40, "x"), "Bad Account Nonce"),
        ("last_x_events_from_contract", ("0x" + "a" * 40, 51), "Too Many Events Requested"),
        ("event_by_block_hash_and_log_index", ("0x" + "a" * 64, "x"), "Bad Log Index"),
    ],
)
def test_resolver_errors(gq, method, args, msg):
    with pytest.raises(ValidationError, match=msg):
        getattr(gq, method)(*args)


def test_found_nothing(gq):
    with pytest.raises(NotFoundError, match="Found nothing"):
        gq.block_by_hash("0x" + "f" * 64)
