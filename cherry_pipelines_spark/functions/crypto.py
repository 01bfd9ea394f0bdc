"""Driver-side crypto/codec helpers.

These are computed once at plan-build time and embedded as literals
(``F.lit(bytes)``) — they never run per-row (SURVEY §2.6 D3-D5):

* ``evm_signature_to_topic0`` — keccak-256 of the canonical event
  signature (reference call site: evm/erc20_transfers.py:94).
* ``anchor_discriminator`` — sha256("global:" + name)[:8], the public
  Anchor instruction-discriminator convention (orca_swaps.py:47,83).
* ``base58_decode`` — Solana address literals → 32-byte keys for Binary
  column comparisons (orca_swaps.py:235-258).

keccak-256 is implemented here in pure Python (the container has no
keccak library; hashlib's sha3_256 is NIST SHA-3 with different padding,
*not* keccak-256).  Only ever called on short signature strings at plan
build, so performance is irrelevant.
"""

from __future__ import annotations

import hashlib
import re

_KECCAK_ROUNDS = 24
_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]
_MASK = (1 << 64) - 1


def _rol(x: int, n: int) -> int:
    return ((x << n) | (x >> (64 - n))) & _MASK


def _keccak_f(state: list[list[int]]) -> None:
    for rnd in range(_KECCAK_ROUNDS):
        # theta
        c = [state[x][0] ^ state[x][1] ^ state[x][2] ^ state[x][3] ^ state[x][4] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                state[x][y] ^= d[x]
        # rho + pi
        b = [[0] * 5 for _ in range(5)]
        for x in range(5):
            for y in range(5):
                b[y][(2 * x + 3 * y) % 5] = _rol(state[x][y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                state[x][y] = b[x][y] ^ ((~b[(x + 1) % 5][y]) & b[(x + 2) % 5][y])
        # iota
        state[0][0] ^= _RC[rnd]


def keccak256(data: bytes) -> bytes:
    """keccak-256 (pre-NIST padding 0x01) — the EVM hash function."""
    rate = 136  # 1088-bit rate for 256-bit output
    state = [[0] * 5 for _ in range(5)]
    # pad10*1 with keccak domain byte 0x01
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    for block_start in range(0, len(padded), rate):
        block = padded[block_start : block_start + rate]
        for i in range(rate // 8):
            lane = int.from_bytes(block[i * 8 : i * 8 + 8], "little")
            x, y = i % 5, i // 5
            state[x][y] ^= lane
        _keccak_f(state)
    out = bytearray()
    for i in range(4):  # 32 bytes = 4 lanes
        x, y = i % 5, i // 5
        out += state[x][y].to_bytes(8, "little")
    return bytes(out)


def evm_signature_to_topic0(signature: str) -> bytes:
    """keccak-256 of the canonical signature, e.g.
    ``Transfer(address,address,uint256)`` → 32-byte topic0.

    Also accepts the annotated form used by decode configs
    (``Transfer(address indexed from, address indexed to, uint256 amount)``)
    and canonicalizes it first.
    """
    return keccak256(canonical_signature(signature).encode("ascii"))


def canonical_signature(signature: str) -> str:
    """Strip parameter names / ``indexed`` markers: keep only types."""
    m = re.match(r"^\s*(\w+)\s*\((.*)\)\s*$", signature, re.S)
    if not m:
        raise ValueError(f"bad event signature: {signature!r}")
    name, params = m.group(1), m.group(2).strip()
    if not params:
        return f"{name}()"
    types = []
    for p in params.split(","):
        toks = p.strip().split()
        if not toks:
            raise ValueError(f"bad parameter in signature: {signature!r}")
        types.append(toks[0])
    return f"{name}({','.join(types)})"


def anchor_discriminator(name: str) -> bytes:
    """Anchor instruction discriminator: sha256("global:" + name)[:8]."""
    return hashlib.sha256(b"global:" + name.encode("ascii")).digest()[:8]


_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}


def base58_decode(s: str) -> bytes:
    """Bitcoin-alphabet base58 decode (Solana addresses)."""
    num = 0
    for ch in s:
        num = num * 58 + _B58_INDEX[ch]
    raw = num.to_bytes((num.bit_length() + 7) // 8, "big") if num else b""
    n_leading = len(s) - len(s.lstrip("1"))
    return b"\x00" * n_leading + raw


def base58_encode(b: bytes) -> str:
    num = int.from_bytes(b, "big")
    out = ""
    while num:
        num, rem = divmod(num, 58)
        out = _B58_ALPHABET[rem] + out
    n_leading = len(b) - len(b.lstrip(b"\x00"))
    return "1" * n_leading + out
