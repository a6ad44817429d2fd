"""REST façade parity: validation cascades, error messages, and JSON wire
shapes mirroring app/rest/rest.go + app/data/*.go MarshalJSON."""

from __future__ import annotations

import pytest

from evm_indexer_spark.api import RestFacade, create_event_topic_map, range_checker
from evm_indexer_spark.errors import NotFoundError, ValidationError
from evm_indexer_spark.operators.historical import HistoricalQueries
from evm_indexer_spark.sources.fixtures import block_hash, tx_hash


@pytest.fixture(scope="module")
def facade(evm):
    return RestFacade(
        HistoricalQueries(evm["blocks"], evm["transactions"], evm["events"])
    )


# -- guardrails, no Spark job launched (P12/P13) ----------------------------


def test_range_checker_semantics():
    assert range_checker("5", "104", 100) == (5, 104)
    with pytest.raises(ValidationError):
        range_checker("5", "105", 100)  # to - from == limit rejected
    with pytest.raises(ValidationError):
        range_checker("10", "5", 100)  # uint64 wrap in reference
    with pytest.raises(ValidationError):
        range_checker("x", "5", 100)


def test_topic_map_skips_empties():
    assert create_event_topic_map("0xa", "", "0xc", "") == {0: "0xa", 2: "0xc"}
    assert create_event_topic_map() == {}


@pytest.mark.parametrize(
    "method,params,msg",
    [
        ("block", {}, "Bad query param(s)"),
        ("block", {"number": "nope"}, "Bad block number"),
        ("block", {"fromBlock": "0", "toBlock": "100"}, "Bad block number range"),
        ("block", {"fromTime": "0", "toTime": "99999"}, "Bad block time range"),
        ("transaction", {}, "Bad query param(s)"),
        ("transaction", {"fromAccount": "0x" + "a" * 40, "nonce": "x"}, "Bad account nonce"),
        (
            "transaction",
            {"fromAccount": "0x" + "a" * 40, "fromBlock": "0", "toBlock": "1000"},
            "Bad block number range",
        ),
        ("event", {}, "Bad query param(s)"),
        ("event", {"blockHash": "0x" + "a" * 64, "logIndex": "x"}, "Bad log index"),
        ("event", {"contract": "0x" + "a" * 40, "count": "51"}, "Too many events requested"),
        ("event", {"contract": "0x" + "a" * 40, "count": "x"}, "Bad event count"),
        (
            "event",
            {"contract": "0x" + "a" * 40, "fromBlock": "0", "toBlock": "500",
             "topic0": "0x" + "b" * 64},
            "Bad block number range",
        ),
    ],
)
def test_error_branches(facade, method, params, msg):
    with pytest.raises(ValidationError, match=msg.replace("(", "\\(").replace(")", "\\)")):
        getattr(facade, method)(params)


def test_malformed_hash_falls_through_to_bad_params(facade):
    # 0x-prefixed but wrong length is NOT dispatched as a hash lookup
    with pytest.raises(ValidationError, match="Bad query param"):
        facade.block({"hash": "0x1234"})


# -- happy paths + wire shapes ----------------------------------------------


def test_block_by_hash_shape(facade):
    out = facade.block({"hash": block_hash(1)})
    assert out["hash"] == block_hash(1)
    assert out["number"] == 1
    assert list(out)[:4] == ["hash", "number", "time", "parentHash"]
    assert out["extraData"] == ""  # number % 5 != 0 → empty bytes → ""


def test_block_extradata_hex(facade):
    out = facade.block({"number": "5"})
    assert out["extraData"].startswith("0x") and len(out["extraData"]) == 66


def test_block_number_range(facade):
    out = facade.block({"fromBlock": "1", "toBlock": "10"})
    assert {b["number"] for b in out["blocks"]} == set(range(1, 11))


def test_block_txs(facade):
    out = facade.block({"number": "3", "tx": "yes"})
    assert len(out["transactions"]) == 3  # n_tx = number % 7


def test_tx_normal_has_to_not_contract(facade):
    out = facade.transaction({"hash": tx_hash(1, 0)})
    assert "to" in out and "contract" not in out
    assert out["blockHash"] == block_hash(1)


def test_tx_contract_creation_has_contract_not_to(facade):
    # (number + ti) % 20 == 0 → creation; block 20 exists (not a gap)
    out = facade.transaction({"hash": tx_hash(20, 0)})
    assert "contract" in out and "to" not in out
    assert out["contract"].startswith("0x")


def test_tx_not_found(facade):
    with pytest.raises(NotFoundError):
        facade.transaction({"hash": "0x" + "f" * 64})


def test_event_zero_data_rendered_empty(facade):
    out = facade.event({"blockHash": block_hash(1)})
    ev = out["events"][0]
    assert ev["data"] == ""  # 64 zero bytes → "" (event.go:33)
    assert isinstance(ev["topics"], list) and len(ev["topics"]) == 1


def test_event_by_tx_hash(facade):
    out = facade.event({"txHash": tx_hash(3, 0)})
    assert len(out["events"]) == 3  # n_ev = (3+0) % 4
    assert all(e["txHash"] == tx_hash(3, 0) for e in out["events"])


def test_event_topk_capped(facade, pools):
    out = facade.event({"contract": pools["contracts"][0], "count": "5"})
    assert len(out["events"]) == 5


def test_event_positional_topics(facade, pools):
    # block 2 has 2 txs; find events with topic0 = sigs[(2+ei)%5]
    sig = pools["sigs"][2]
    out = facade.event(
        {
            "contract": pools["contracts"][3],
            "fromBlock": "0",
            "toBlock": "99",
            "topic0": sig,
        }
    )
    assert all(e["topics"][0] == sig for e in out["events"])


def test_synced_format(facade):
    out = facade.synced(latest_block_number=999, elapsed_seconds=60.0)
    assert out["synced"].endswith(" %") and out["processed"] > 0
    assert out["eta"].endswith("s")


def test_parse_number_strict_ascii_decimal():
    """strconv.ParseUint parity (common.go:51-62): no '+', no '_'
    separators, no unicode digits, no whitespace."""
    from evm_indexer_spark.api import parse_number

    assert parse_number("0") == 0
    assert parse_number("18446744073709551615") == 2**64 - 1
    for bad in ["+5", "-1", "1_000", "٥", "１２", " 7", "7 ", "0x10", "",
                "18446744073709551616", "1.0", None, 7]:
        with pytest.raises(ValidationError):
            parse_number(bad)


def test_uint64_above_long_max_is_not_found_not_crash(facade):
    """Values in [2^63, 2^64) are valid uint64 (common.go:51-62) but can
    never exist in a bigint/LongType column — the facade must answer
    not-found, never let the literal crash the Java bridge."""
    from evm_indexer_spark.errors import NotFoundError

    hi = str(2**63)          # first non-representable value
    top = str(2**64 - 1)     # uint64 max
    with pytest.raises(NotFoundError):
        facade.block({"number": hi})
    with pytest.raises(NotFoundError):
        facade.block({"number": top, "tx": "yes"})
    with pytest.raises(NotFoundError):
        facade.transaction(
            {"fromAccount": "0x" + "a" * 40, "nonce": hi}
        )
    with pytest.raises(NotFoundError):
        facade.event({"blockNumber": hi, "logIndex": "0"})
    with pytest.raises(NotFoundError):
        facade.event({"blockNumber": "1", "logIndex": top})
    # range starting above 2^63-1 → provably empty → not-found
    with pytest.raises(NotFoundError):
        facade.block({"fromBlock": hi, "toBlock": str(2**63 + 50)})
    # range merely *ending* above gets clamped, then empty → not-found
    with pytest.raises(NotFoundError):
        facade.block(
            {"fromBlock": str(2**63 - 10), "toBlock": str(2**63 + 10)}
        )
