"""Native JSON payload shaping vs the Python facade encoders, Fibonacci
backoff pacing, and gated crypto helpers."""

from __future__ import annotations

import json

import pytest

from evm_indexer_spark import api
from evm_indexer_spark.functions import evmcrypto
from evm_indexer_spark.operators.sync import FibonacciBackoff
from evm_indexer_spark.streaming import publish


def _cross_check(df, payload_fn, dict_fn, n=30):
    out = payload_fn(df).limit(n).collect()
    assert out
    for row in out:
        assert json.loads(row["payload"]) == dict_fn(row)


def test_block_payload_matches_facade(evm):
    _cross_check(evm["blocks"], publish.block_payload, api.block_to_dict)


def test_tx_payload_matches_facade(evm):
    # include both normal and contract-creation branches
    _cross_check(evm["transactions"], publish.tx_payload, api.tx_to_dict)
    creations = evm["transactions"].filter("contract != ''")
    assert creations.count() > 0
    _cross_check(creations, publish.tx_payload, api.tx_to_dict)


def test_event_payload_matches_facade(evm):
    _cross_check(evm["events"], publish.event_payload, api.event_to_dict)
    zero_word = evm["events"].filter("hex(data) = repeat('0', 64)")
    assert zero_word.count() > 0
    for row in publish.event_payload(zero_word).limit(5).collect():
        assert json.loads(row["payload"])["data"] == ""


# -- T4 backoff --------------------------------------------------------------


def test_fibonacci_backoff_sequence():
    clock = [0.0]
    b = FibonacciBackoff(now=lambda: clock[0])
    seq = []
    for _ in range(8):
        seq.append(b.delay)
        b.set_delay()
    assert seq == [1, 2, 3, 5, 8, 13, 21, 34]


def test_backoff_cap_and_reset():
    b = FibonacciBackoff(now=lambda: 0.0)
    b.delay = 2584.0
    b.set_delay()  # 4181 % 3600 = 581 (queue.go:33-35 modulo cap)
    assert b.delay == 581
    b.reset_delay()
    assert b.delay == 1.0


def test_backoff_gates_attempts():
    clock = [100.0]
    b = FibonacciBackoff(now=lambda: clock[0])
    b.set_delay()  # delay 2
    b.set_last_attempted()
    assert not b.can_attempt()
    clock[0] += 2.5
    assert b.can_attempt()


# -- F12 crypto helpers ------------------------------------------------------


@pytest.mark.parametrize(
    "addr,ok",
    [
        ("0x" + "a" * 40, True),
        ("0x" + "A" * 40, True),
        ("0x" + "g" * 40, False),  # non-hex letters rejected
        ("0x" + "a" * 39, False),
        ("a" * 42, False),
        ("", False),
    ],
)
def test_address_validation(addr, ok, spark):
    assert evmcrypto.is_valid_eth_address(addr) is ok
    row = spark.createDataFrame([(addr,)], "a string").select(
        evmcrypto.valid_address_col("a").alias("v")
    ).collect()[0]
    assert row["v"] is ok


def test_sig_rsv():
    sig = bytes(range(32)) + bytes(range(32, 64)) + b"\x01"
    r, s, v = evmcrypto.sig_rsv(sig)
    assert r == bytes(range(32)) and s == bytes(range(32, 64)) and v == 28
    r2, s2, v2 = evmcrypto.sig_rsv("0x" + sig.hex())
    assert (r2, s2, v2) == (r, s, v)
    with pytest.raises(ValueError):
        evmcrypto.sig_rsv(b"\x00" * 10)


def test_keccak_gated():
    if evmcrypto._KECCAK is None:
        with pytest.raises(NotImplementedError):
            evmcrypto.keccak256(b"")
    else:  # pragma: no cover - environment-dependent
        assert evmcrypto.keccak256(b"").hex().startswith("c5d2460186f7")


def test_zero_word_hex_matches_event_dict(spark):
    """hexcodec.hex_encode_event_data must agree with api.event_to_dict
    and publish.event_payload on the all-zero ABI word (32 zero bytes =
    64 hex chars, event.go:32-35)."""
    from pyspark.sql import functions as F

    from evm_indexer_spark.api import event_to_dict
    from evm_indexer_spark.functions.hexcodec import hex_encode_event_data

    cases = [bytes(32), bytes(64), b"", b"\x01" + bytes(31)]
    df = spark.createDataFrame([(d,) for d in cases], "data binary")
    got = [
        r["enc"]
        for r in df.select(hex_encode_event_data("data").alias("enc")).collect()
    ]
    # expected wire forms per the reference: one zero word -> '', empty
    # -> '', two zero words -> rendered, nonzero word -> rendered
    assert got == ["", "0x" + "00" * 64, "", "0x01" + "00" * 31]

    # cross-check with the row-shaping twin used by the REST facade
    from pyspark.sql import Row

    for d, enc in zip(cases, got):
        row = Row(origin="0x" + "11" * 20, index=0, topics=[], data=d,
                  txhash="0x" + "22" * 32, blockhash="0x" + "33" * 32)
        assert event_to_dict(row)["data"] == enc
