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


def test_keccak256_known_vectors():
    """Public Keccak-256 vectors (pre-NIST padding): the empty-string and
    'abc' digests every Ethereum implementation must reproduce, plus the
    deliberate difference from NIST SHA3-256."""
    import hashlib

    from evm_indexer_spark.functions.keccak import keccak256

    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )
    # multi-block absorb (> 136-byte rate)
    assert len(keccak256(b"x" * 500)) == 32
    assert keccak256(b"abc") != hashlib.sha3_256(b"abc").digest()


def test_address_of_private_key_one():
    """The address of private key 0x01 is public knowledge:
    keccak(G)[12:] = 0x7e5f4552091a69125d5dfcb7b8c2659029395bdf."""
    from evm_indexer_spark.functions import secp256k1 as ec
    from evm_indexer_spark.functions.evmcrypto import public_key_bytes_to_address

    pub = b"\x04" + ec.GX.to_bytes(32, "big") + ec.GY.to_bytes(32, "big")
    assert public_key_bytes_to_address(pub) == (
        "0x7e5f4552091a69125d5dfcb7b8c2659029395bdf"
    )


def test_ecdsa_recover_roundtrip():
    """Sign with textbook ECDSA (independent formula), recover, compare:
    the recovered key must equal d*G for a spread of keys and hashes."""
    from evm_indexer_spark.functions import secp256k1 as ec
    from evm_indexer_spark.functions.keccak import keccak256

    for d in (1, 2, 0xDEADBEEF, ec.N - 5):
        q = ec._mul(d, (ec.GX, ec.GY))
        expect = b"\x04" + q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
        for msg in (b"hello", b"evm", b"\x00" * 32):
            h = keccak256(msg)
            r, s, rec = ec.ecdsa_sign(h, d, k=0x12345 + d)
            assert ec.ecdsa_recover(h, r, s, rec) == expect


def test_recover_sender_legacy_and_eip155():
    """End-to-end sender recovery: build the signing hash, sign with a
    known key, recover through the public API — both pre-EIP-155 (v=27/28)
    and EIP-155 (v = chain_id*2 + 35/36) envelopes."""
    from evm_indexer_spark.functions import secp256k1 as ec
    from evm_indexer_spark.functions.evmcrypto import (
        public_key_bytes_to_address,
        recover_sender,
    )

    d = 0x1234567890ABCDEF
    q = ec._mul(d, (ec.GX, ec.GY))
    expected = public_key_bytes_to_address(
        b"\x04" + q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
    )
    tx = dict(nonce=7, gas_price=25_000_000_000, gas=21_000,
              to="0x" + "ab" * 20, value=10**18, data=b"")

    for chain_id in (None, 1, 137):
        h = ec.legacy_signing_hash(
            tx["nonce"], tx["gas_price"], tx["gas"],
            bytes.fromhex("ab" * 20), tx["value"], tx["data"], chain_id,
        )
        r, s, rec = ec.ecdsa_sign(h, d, k=0x5DEECE66D)
        v = rec + 27 if chain_id is None else chain_id * 2 + 35 + rec
        got = recover_sender(
            tx["nonce"], tx["gas_price"], tx["gas"], tx["to"],
            tx["value"], tx["data"], v, r, s,
        )
        assert got == expected, f"chain_id={chain_id}"


def test_rlp_encode_shapes():
    """RLP yellow-paper examples: ints, strings, nested lists."""
    from evm_indexer_spark.functions.secp256k1 import rlp_encode

    assert rlp_encode(b"") == b"\x80"
    assert rlp_encode(0) == b"\x80"
    assert rlp_encode(b"\x0f") == b"\x0f"
    assert rlp_encode(b"dog") == b"\x83dog"
    assert rlp_encode([]) == b"\xc0"
    assert rlp_encode([b"cat", b"dog"]) == b"\xc8\x83cat\x83dog"
    assert rlp_encode(1024) == b"\x82\x04\x00"
    long = b"a" * 56
    assert rlp_encode(long) == b"\xb8\x38" + long


def test_sender_recovery_udf_sparkside(spark):
    """The batch UDF recovers the same address the scalar path does, and
    yields NULL (not a crash) for garbage signatures."""
    from evm_indexer_spark.functions import secp256k1 as ec
    from evm_indexer_spark.functions.evmcrypto import (
        public_key_bytes_to_address,
        sender_recovery_udf,
    )

    d = 0xC0FFEE
    q = ec._mul(d, (ec.GX, ec.GY))
    expected = public_key_bytes_to_address(
        b"\x04" + q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
    )
    to = "0x" + "ab" * 20
    h = ec.legacy_signing_hash(
        1, 10**9, 21_000, bytes.fromhex("ab" * 20), 5, b"", 1
    )
    r, s, rec = ec.ecdsa_sign(h, d, k=99991)
    rows = [
        (1, str(10**9), 21_000, to, "5", "0x", 37 + rec, hex(r), hex(s)),
        (1, str(10**9), 21_000, to, "5", "0x", 29, hex(r), hex(s)),  # bad v
        # NULL v: must be NULL out, never coerced to parity 0 (which
        # would fabricate a plausible-but-wrong sender)
        (1, str(10**9), 21_000, to, "5", "0x", None, hex(r), hex(s)),
    ]
    df = spark.createDataFrame(
        rows,
        "nonce long, gasprice string, gas long, to string, value string, "
        "data string, v long, r string, s string",
    )
    udf = sender_recovery_udf()
    got = df.select(
        udf("nonce", "gasprice", "gas", "to", "value", "data", "v", "r", "s")
        .alias("from")
    ).collect()
    assert got[0]["from"] == expected
    assert got[1]["from"] is None
    assert got[2]["from"] is None


def test_ecdsa_recover_property():
    """Property check over random keys/nonces/hashes: recovery returns
    exactly d*G. Bounded examples — pure-Python EC math is ~ms per op."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from evm_indexer_spark.functions import secp256k1 as ec

    @settings(max_examples=15, deadline=None)
    @given(
        st.integers(1, ec.N - 1),
        st.integers(1, ec.N - 1),
        st.binary(min_size=32, max_size=32),
    )
    def check(d, k, h):
        q = ec._mul(d, (ec.GX, ec.GY))
        expect = b"\x04" + q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")
        r, s, rec = ec.ecdsa_sign(h, d, k)
        if r == 0 or s == 0:  # degenerate nonce; signing would retry
            return
        assert ec.ecdsa_recover(h, r, s, rec) == expect

    check()
