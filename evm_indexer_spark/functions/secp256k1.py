"""Pure-Python secp256k1 ECDSA public-key recovery + minimal RLP.

Everything here derives from public standards: the secp256k1 curve
parameters (SEC 2 v2 §2.4.1), ECDSA recovery (SEC 1 v2 §4.1.6), RLP
(Ethereum yellow paper appendix B), and the legacy/EIP-155 transaction
signing hash. Affine arithmetic with ``pow(x, -1, p)`` inverses — a few
hundred microseconds per recovery, which is the right trade for an
ingestion-time *fallback* path (sender recovery only runs when a raw
landing doc lacks ``from``; see ``evmcrypto.recover_sender``).

Reference parity: ``TransactionSender`` (app/util/util.go:131-150)
recovers the sender with go-ethereum's signer chain; this module
reimplements the two signer cases that cover legacy traffic (pre- and
post-EIP-155). Typed (EIP-2718) envelopes land with explicit ``from``
in every practical source, and raise cleanly here.
"""

from __future__ import annotations

from .keccak import keccak256 as _keccak_fallback

# SEC 2 v2, §2.4.1 — secp256k1 domain parameters
P = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEFFFFFC2F
N = 0xFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFFEBAAEDCE6AF48A03BBFD25E8CD0364141
GX = 0x79BE667EF9DCBBAC55A06295CE870B07029BFCDB2DCE28D959F2815B16F81798
GY = 0x483ADA7726A3C4655DA4FBFC0E1108A8FD17B448A68554199C47D08FFB10D4B8
_B = 7

Point = tuple[int, int] | None  # None = point at infinity


def _inv(x: int, m: int) -> int:
    return pow(x, -1, m)


def _add(p1: Point, p2: Point) -> Point:
    if p1 is None:
        return p2
    if p2 is None:
        return p1
    x1, y1 = p1
    x2, y2 = p2
    if x1 == x2:
        if (y1 + y2) % P == 0:
            return None
        lam = (3 * x1 * x1) * _inv(2 * y1, P) % P
    else:
        lam = (y2 - y1) * _inv(x2 - x1, P) % P
    x3 = (lam * lam - x1 - x2) % P
    return x3, (lam * (x1 - x3) - y1) % P


def _mul(k: int, pt: Point) -> Point:
    acc: Point = None
    while k:
        if k & 1:
            acc = _add(acc, pt)
        pt = _add(pt, pt)
        k >>= 1
    return acc


def ecdsa_recover(msg_hash: bytes, r: int, s: int, rec_id: int) -> bytes:
    """Recover the uncompressed public key (65 bytes, 0x04-prefixed)
    from a signature — SEC 1 v2 §4.1.6.

    ``rec_id`` is the 0-3 recovery index (Ethereum v = rec_id + 27 for
    legacy, or rec_id derived from EIP-155 v).
    """
    if not (1 <= r < N and 1 <= s < N):
        raise ValueError("r/s out of range")
    if not 0 <= rec_id <= 3:
        raise ValueError("rec_id must be 0..3")
    x = r + (rec_id >> 1) * N
    if x >= P:
        raise ValueError("invalid recovery index for this r")
    # lift x: y² = x³ + 7 (mod p); p ≡ 3 mod 4 → sqrt = pow(a, (p+1)/4)
    alpha = (pow(x, 3, P) + _B) % P
    y = pow(alpha, (P + 1) // 4, P)
    if y * y % P != alpha:
        raise ValueError("r does not correspond to a curve point")
    if (y & 1) != (rec_id & 1):
        y = P - y
    rpoint: Point = (x, y)
    e = int.from_bytes(msg_hash, "big") % N
    rinv = _inv(r, N)
    # Q = r⁻¹(sR − eG)
    q = _mul(rinv, _add(_mul(s, rpoint), _mul((N - e) % N, (GX, GY))))
    if q is None:
        raise ValueError("recovered point at infinity")
    return b"\x04" + q[0].to_bytes(32, "big") + q[1].to_bytes(32, "big")


def ecdsa_sign(msg_hash: bytes, priv: int, k: int) -> tuple[int, int, int]:
    """Textbook ECDSA sign with caller-supplied nonce *k* — test-vector
    generator for the recovery path (production signing is out of scope;
    the engine only ever *recovers*)."""
    e = int.from_bytes(msg_hash, "big") % N
    rp = _mul(k, (GX, GY))
    assert rp is not None
    r = rp[0] % N
    s = _inv(k, N) * (e + r * priv) % N
    rec_id = (rp[1] & 1) | (2 if rp[0] >= N else 0)
    if s > N // 2:  # low-s normalization flips the recovery parity
        s = N - s
        rec_id ^= 1
    return r, s, rec_id


# -- RLP (yellow paper appendix B) ------------------------------------------


def rlp_encode(item) -> bytes:
    """RLP-encode nested ints / bytes / lists (ints big-endian minimal)."""
    if isinstance(item, int):
        item = b"" if item == 0 else item.to_bytes((item.bit_length() + 7) // 8, "big")
    if isinstance(item, (bytes, bytearray)):
        item = bytes(item)
        if len(item) == 1 and item[0] < 0x80:
            return item
        return _rlp_len(len(item), 0x80) + item
    if isinstance(item, (list, tuple)):
        body = b"".join(rlp_encode(x) for x in item)
        return _rlp_len(len(body), 0xC0) + body
    raise TypeError(f"cannot RLP-encode {type(item)}")


def _rlp_len(n: int, offset: int) -> bytes:
    if n < 56:
        return bytes([offset + n])
    nb = n.to_bytes((n.bit_length() + 7) // 8, "big")
    return bytes([offset + 55 + len(nb)]) + nb


def legacy_signing_hash(
    nonce: int,
    gas_price: int,
    gas: int,
    to: bytes,
    value: int,
    data: bytes,
    chain_id: int | None,
    keccak=None,
) -> bytes:
    """Signing hash of a legacy transaction: pre-EIP-155 (6 fields) or
    EIP-155 (9 fields, chain_id, 0, 0) — the two signer-chain cases of
    ``TransactionSender`` (util.go:131-150)."""
    kec = keccak or _keccak_fallback
    fields: list = [nonce, gas_price, gas, to, value, data]
    if chain_id is not None:
        fields += [chain_id, 0, 0]
    return kec(rlp_encode(fields))


def v_to_rec_id(v: int) -> tuple[int, int | None]:
    """Split an Ethereum legacy ``v`` into (rec_id, chain_id):
    27/28 → pre-EIP-155; ≥35 → EIP-155 with chain_id = (v-35)//2."""
    if v in (27, 28):
        return v - 27, None
    if v in (0, 1):
        return v, None
    if v >= 35:
        return (v - 35) % 2, (v - 35) // 2
    raise ValueError(f"unsupported v: {v}")
