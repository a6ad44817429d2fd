"""EVM crypto helpers (SURVEY F12): address validation, signature RSV
split, and gated Keccak-256.

The reference uses go-ethereum for Keccak-based address derivation and
signer-chain sender recovery (``app/util/util.go:18-57,108-150``). Those
are only needed when raw *unsigned* landing data lacks the ``from``
field; every serving-path computation works without them. Keccak-256 is
NOT in the Python standard library (``hashlib.sha3_256`` is NIST SHA-3
with different padding — silently wrong for EVM), and no keccak package
ships in this environment, so the hash is import-gated: real when
``eth_hash``/``pysha3``/``pycryptodome`` is installed, a clearly-marked
``NotImplementedError`` otherwise. The pure-string helpers are fully
implemented and tested.
"""

from __future__ import annotations

import re

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
        return None


_KECCAK = _keccak_backend()


def keccak256(data: bytes) -> bytes:
    """Keccak-256 (EVM variant). STUB unless a keccak package is
    installed — see module docstring; hashlib.sha3_256 is deliberately
    NOT used (wrong padding)."""
    if _KECCAK is None:
        raise NotImplementedError(
            "keccak-256 requires eth_hash/pysha3/pycryptodome, none of "
            "which are installed in this environment"
        )
    return _KECCAK(data)


def public_key_bytes_to_address(pubkey: bytes) -> str:
    """PublicKeyBytesToAddress, util.go:49-57: keccak(pubkey[1:])[12:].

    Gated on ``keccak256``; used only by sender recovery over raw
    unsigned transactions.
    """
    digest = keccak256(pubkey[1:])
    return "0x" + digest[12:].hex()
