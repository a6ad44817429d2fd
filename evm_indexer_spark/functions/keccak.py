"""Pure-Python Keccak-256 (the pre-NIST Keccak Ethereum uses).

Implements the Keccak-f[1600] permutation and sponge from the public
Keccak reference specification (Bertoni, Daemen, Peeters, Van Assche,
"The Keccak reference"; also FIPS-202 §3 with the 0x01 domain padding
instead of SHA-3's 0x06). ``hashlib.sha3_256`` CANNOT substitute: NIST
changed the padding byte, so every digest differs.

This is the always-available fallback backend for
``evmcrypto.keccak256``; when a native package (eth-hash / pysha3 /
pycryptodome) is installed it is preferred for speed. Pure Python runs
~1 MB/s — fine for the sender-recovery path, which hashes one small
RLP payload + one 64-byte public key per transaction and only runs
when landing data lacks ``from``.
"""

from __future__ import annotations

_M64 = (1 << 64) - 1

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A,
    0x8000000080008000, 0x000000000000808B, 0x0000000080000001,
    0x8000000080008081, 0x8000000000008009, 0x000000000000008A,
    0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089,
    0x8000000000008003, 0x8000000000008002, 0x8000000000000080,
    0x000000000000800A, 0x800000008000000A, 0x8000000080008081,
    0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y] from the Keccak reference, Table 2
_R = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]

_RATE = 136  # bytes; 1600/8 - 2*256/8


def _rol(v: int, n: int) -> int:
    return ((v << n) | (v >> (64 - n))) & _M64


def _keccak_f(a: list[list[int]]) -> list[list[int]]:
    for rc in _RC:
        # theta
        c = [a[x][0] ^ a[x][1] ^ a[x][2] ^ a[x][3] ^ a[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        a = [[a[x][y] ^ d[x] for y in range(5)] for x in range(5)]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(a[x][y], _R[x][y])
        # chi
        a = [
            [b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y] & _M64)
             for y in range(5)]
            for x in range(5)
        ]
        # iota
        a[0][0] ^= rc
    return a


def keccak256(data: bytes) -> bytes:
    """Keccak-256 digest of *data* (Ethereum/EVM variant, 0x01 padding)."""
    # multi-rate padding: 0x01 .. 0x80 (single byte 0x81 when len%rate==135)
    padlen = _RATE - (len(data) % _RATE)
    padded = bytearray(data)
    if padlen == 1:
        padded.append(0x81)
    else:
        padded.append(0x01)
        padded.extend(b"\x00" * (padlen - 2))
        padded.append(0x80)

    state = [[0] * 5 for _ in range(5)]
    for off in range(0, len(padded), _RATE):
        block = padded[off : off + _RATE]
        for i in range(_RATE // 8):
            lane = int.from_bytes(block[8 * i : 8 * i + 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        state = _keccak_f(state)

    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)
