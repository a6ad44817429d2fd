"""EVM crypto helpers (SURVEY F12/S4): address validation, signature RSV
split, Keccak-256, and full sender recovery.

The reference uses go-ethereum for Keccak-based address derivation and
signer-chain sender recovery (``app/util/util.go:18-57,108-150``). Those
are only needed when raw landing data lacks the ``from`` field; every
serving-path computation works without them. Keccak-256 is NOT in the
Python standard library (``hashlib.sha3_256`` is NIST SHA-3 with
different padding — silently wrong for EVM): a native package
(eth-hash / pysha3 / pycryptodome) is used when installed, otherwise
the pure-Python sponge in ``functions.keccak`` (public Keccak spec)
makes the path always available. Sender recovery
(``recover_sender``) composes it with pure-Python secp256k1 ECDSA
recovery and RLP signing hashes (``functions.secp256k1``), covering
the legacy and EIP-155 signer cases of ``TransactionSender``.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

_ADDRESS_RE = re.compile(r"^0x[0-9a-fA-F]{40}$")


def is_valid_eth_address(s: str) -> bool:
    """IsValidAddress, util.go:18-22 — shape check, pure Python."""
    return bool(_ADDRESS_RE.match(s or ""))


def valid_address_col(col: Column | str) -> Column:
    """Column form of the address shape check (rlike, codegen-native)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.rlike("^0x[0-9a-fA-F]{40}$")


def sig_rsv(sig: bytes | str) -> tuple[bytes, bytes, int]:
    """SigRSV, util.go:108-129 — split a 65-byte signature into
    (R, S, V) with V offset +27. Pure byte slicing, no crypto."""
    if isinstance(sig, str):
        body = sig[2:] if sig.startswith("0x") else sig
        sig = bytes.fromhex(body)
    if len(sig) < 65:
        raise ValueError("signature must be 65 bytes")
    return sig[0:32], sig[32:64], sig[64] + 27


def _keccak_backend():
    try:  # eth-hash with a backend
        from eth_hash.auto import keccak  # type: ignore

        return lambda b: keccak(b)
    except ImportError:
        pass
    try:  # pysha3
        import sha3  # type: ignore

        return lambda b: sha3.keccak_256(b).digest()
    except ImportError:
        pass
    try:  # pycryptodome
        from Crypto.Hash import keccak as _k  # type: ignore

        return lambda b: _k.new(data=b, digest_bits=256).digest()
    except ImportError:
        pass
    # always-available pure-Python sponge (functions/keccak.py)
    from .keccak import keccak256 as _pure

    return _pure


_KECCAK = _keccak_backend()


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (EVM variant). Native backend when installed, the
    pure-Python sponge otherwise; hashlib.sha3_256 is deliberately NOT
    used (wrong padding)."""
    return _KECCAK(data)


def public_key_bytes_to_address(pubkey: bytes) -> str:
    """PublicKeyBytesToAddress, util.go:49-57: keccak(pubkey[1:])[12:].

    Gated on ``keccak256``; used only by sender recovery over raw
    unsigned transactions.
    """
    digest = keccak256(pubkey[1:])
    return "0x" + digest[12:].hex()


def recover_sender(
    nonce: int,
    gas_price: int,
    gas: int,
    to: str | None,
    value: int,
    data: bytes,
    v: int,
    r: int,
    s: int,
) -> str:
    """Recover the sender address of a signed legacy transaction —
    ``TransactionSender``'s signer fallback chain (util.go:131-150) for
    the pre-EIP-155 and EIP-155 cases. ``to=None`` for contract
    creation. Returns the lowercase 0x address.
    """
    from .secp256k1 import ecdsa_recover, legacy_signing_hash, v_to_rec_id

    rec_id, chain_id = v_to_rec_id(v)
    to_bytes = b"" if not to else bytes.fromhex(to[2:] if to.startswith("0x") else to)
    h = legacy_signing_hash(
        nonce, gas_price, gas, to_bytes, value, data, chain_id, keccak=keccak256
    )
    pub = ecdsa_recover(h, r, s, rec_id)
    return public_key_bytes_to_address(pub)


def sender_recovery_udf():
    """Arrow-batched sender recovery for ingestion: fills a missing
    ``from`` column from signature fields (v, r, s as 0x-hex or decimal
    strings). Per-row Python inside the batch — the deliberate slow
    path, only ever applied to the (rare) rows whose source omitted the
    sender; filter first, recover second, join back.
    """
    from pyspark.sql.functions import pandas_udf

    def _i(x) -> int:
        # a missing signature field is unrecoverable, never zero — v=0 is
        # a VALID raw parity, so coercing NULL→0 would fabricate a
        # plausible-but-wrong sender address (silent store corruption)
        if x is None or (isinstance(x, float) and pd.isna(x)):
            raise ValueError("missing signature field")
        s = str(x)
        return int(s, 16) if s.startswith("0x") else int(s)

    @pandas_udf("string")
    def rec(
        nonce: pd.Series, gas_price: pd.Series, gas: pd.Series,
        to: pd.Series, value: pd.Series, data: pd.Series,
        v: pd.Series, r: pd.Series, s: pd.Series,
    ) -> pd.Series:
        out = []
        for i in range(len(nonce)):
            try:
                raw = data.iloc[i]
                blob = (
                    bytes.fromhex(str(raw)[2:]) if isinstance(raw, str)
                    else bytes(raw or b"")
                )
                out.append(
                    recover_sender(
                        _i(nonce.iloc[i]), _i(gas_price.iloc[i]),
                        _i(gas.iloc[i]), to.iloc[i], _i(value.iloc[i]),
                        blob, _i(v.iloc[i]), _i(r.iloc[i]), _i(s.iloc[i]),
                    )
                )
            except (ValueError, TypeError):
                out.append(None)  # unrecoverable row → heal via T7/refetch
        return pd.Series(out, dtype="object")

    return rec
