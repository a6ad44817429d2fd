"""Subscription validation regex, wildcard matrices (README examples),
and manager protocol parity (streaming/subscribe.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from evm_indexer_spark.streaming.subscribe import (
    SubscriptionManager,
    is_valid_subscription,
    parse_filters,
    subscription_predicate,
)

FROM_A = "0xc9D50e0a571aDd06C7D5f1452DcE2F523FB711a1"
TO_A = "0x4774fEd3f2838f504006BE53155cA9cbDDEe9f0c"
CONTRACT = "0xcb3fA413B23b12E402Cfcd8FA120f983FB70d8E8"
SIG = "0x2ab93f65628379309f36cb125e90d7c902454a545c4f8b8cb0794af75c24b807"
TRANSFER = "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"


@pytest.mark.parametrize(
    "name,ok",
    [
        ("block", True),
        ("transaction", True),
        ("transaction/*/*", True),
        (f"transaction/{FROM_A}/*", True),
        (f"transaction/*/{TO_A}", True),
        (f"transaction/{FROM_A}", True),  # trailing segment omitted
        ("event", True),
        ("event/*/*/*/*/*", True),
        (f"event/{CONTRACT}/{SIG}/*/*/*", True),
        (f"event/{CONTRACT}", True),
        ("blocks", False),
        ("transaction/0x1234/*", False),  # short address
        (f"event/{SIG}/*", False),  # 66-char where address expected
        ("foo", False),
        ("", False),
        (f"transaction/{FROM_A}/{TO_A}/extra", False),
    ],
)
def test_validation_regex(name, ok):
    assert is_valid_subscription(name) is ok


def test_parse_pads_wildcards():
    assert parse_filters("transaction") == ("transaction", ["*", "*"])
    assert parse_filters(f"transaction/{FROM_A}") == ("transaction", [FROM_A, "*"])
    assert parse_filters(f"event/{CONTRACT}") == (
        "event",
        [CONTRACT, "*", "*", "*", "*"],
    )
    assert parse_filters("block") == ("block", [])
    with pytest.raises(ValueError):
        parse_filters("nope")


@pytest.fixture(scope="module")
def txs(spark):
    # lowercase storage (ingest normalization); patterns arrive mixed-case
    rows = [
        ("0xt1", FROM_A.lower(), TO_A.lower()),
        ("0xt2", FROM_A.lower(), "0x" + "b" * 40),
        ("0xt3", "0x" + "c" * 40, TO_A.lower()),
        ("0xt4", "0x" + "c" * 40, ""),  # contract creation, to absent
    ]
    return spark.createDataFrame(rows, "hash string, from string, to string")


def _tx_hashes(txs, name):
    return {
        r["hash"]
        for r in txs.filter(subscription_predicate(name)).collect()
    }


def test_tx_wildcard_matrix(txs):
    assert _tx_hashes(txs, "transaction/*/*") == {"0xt1", "0xt2", "0xt3", "0xt4"}
    assert _tx_hashes(txs, f"transaction/{FROM_A}/*") == {"0xt1", "0xt2"}
    assert _tx_hashes(txs, f"transaction/*/{TO_A}") == {"0xt1", "0xt3"}
    assert _tx_hashes(txs, f"transaction/{FROM_A}/{TO_A}") == {"0xt1"}
    # omitted `to` segment behaves as *
    assert _tx_hashes(txs, f"transaction/{FROM_A}") == {"0xt1", "0xt2"}


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        ("0xe1", CONTRACT.lower(), [SIG.lower(), TRANSFER.lower()]),
        ("0xe2", CONTRACT.lower(), [TRANSFER.lower()]),
        ("0xe3", "0x" + "d" * 40, [TRANSFER.lower()]),
        ("0xe4", "0x" + "d" * 40, []),  # no topics at all
    ]
    return spark.createDataFrame(
        rows, "id string, origin string, topics array<string>"
    )


def _ev_ids(events, name):
    return {
        r["id"] for r in events.filter(subscription_predicate(name)).collect()
    }


def test_event_wildcard_matrix(events):
    assert _ev_ids(events, "event/*/*/*/*/*") == {"0xe1", "0xe2", "0xe3", "0xe4"}
    assert _ev_ids(events, f"event/{CONTRACT}/*/*/*/*") == {"0xe1", "0xe2"}
    assert _ev_ids(events, f"event/{CONTRACT}/{SIG}/*/*/*") == {"0xe1"}
    assert _ev_ids(events, f"event/*/{TRANSFER}/*/*/*") == {"0xe2", "0xe3"}
    # topic1 position: only 0xe1 has 2 topics
    assert _ev_ids(events, f"event/*/*/{TRANSFER}/*/*") == {"0xe1"}
    # out-of-range position with specific sig never matches topicless events
    assert _ev_ids(events, f"event/*/{SIG}/*/*/*") == {"0xe1"}
    # omitted trailing segments are wildcards
    assert _ev_ids(events, f"event/{CONTRACT}") == {"0xe1", "0xe2"}


def test_manager_protocol():
    m = SubscriptionManager()
    assert m.subscribe("block") == {"code": 1, "message": "Subscribed to `block`"}
    assert m.subscribe("block") == {"code": 0, "message": "Bad Payload"}  # dup
    assert m.subscribe("transaction/*/*")["code"] == 1
    assert m.subscribe(f"transaction/{FROM_A}/*")["code"] == 1  # same root ok
    assert m.unsubscribe("event/*/*/*/*/*") == {"code": 0, "message": "Bad Payload"}
    assert m.unsubscribe("block") == {
        "code": 1,
        "message": "Unsubscribed from `block`",
    }
    assert m.unsubscribe("block")["code"] == 0  # already gone


def test_manager_filtered_union(txs):
    m = SubscriptionManager()
    m.subscribe(f"transaction/{FROM_A}/{TO_A}")
    m.subscribe(f"transaction/*/{TO_A}")
    got = {r["hash"] for r in m.filtered("transaction", txs).collect()}
    assert got == {"0xt1", "0xt3"}
    # no event subscriptions → empty delivery set, not full stream
    assert m.filtered("event", txs).count() == 0


def test_manager_match_columns_single_pass(txs):
    m = SubscriptionManager()
    m.subscribe("transaction/*/*")
    m.subscribe(f"transaction/{FROM_A}/*")
    out = m.match_columns("transaction", txs)
    assert [c for c in out.columns if c.startswith("_sub")] == ["_sub0", "_sub1"]
    r = {row["hash"]: (row["_sub0"], row["_sub1"]) for row in out.collect()}
    # '*' sorts before '0': _sub0 = transaction/*/*, _sub1 = transaction/<FROM_A>/*
    assert r["0xt3"] == (True, False)
    assert r["0xt1"] == (True, True)
