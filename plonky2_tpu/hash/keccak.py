"""Keccak-256 (original 0x01 padding, as the `keccak_hash` crate) with a
numpy-vectorized keccak-f[1600] core for batch Merkle hashing
(reference hash/keccak.rs).

Keccak is not worth a TPU kernel (bitwise permutation, host-side trees are
fine — SURVEY.md §7.13); the batch dimension is vectorized over numpy u64
lanes instead.
"""

from __future__ import annotations

import numpy as np

from plonky2_tpu.field import scalar as fs

_RC = np.array([
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
], dtype=np.uint64)

# rotation offsets r[x,y] for lane A[x + 5y]
_ROT = np.array([
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
], dtype=np.uint64)  # _ROT[x][y]


def _rotl(v: np.ndarray, r: int) -> np.ndarray:
    r = int(r) % 64
    if r == 0:
        return v
    return (v << np.uint64(r)) | (v >> np.uint64(64 - r))


def keccak_f(states: np.ndarray) -> np.ndarray:
    """keccak-f[1600] over [n, 25] u64 lane arrays (lane A[x+5y])."""
    from plonky2_tpu import native

    if native.available:
        return native.keccak_f(states)
    return keccak_f_np(states)


def keccak_f_np(states: np.ndarray) -> np.ndarray:
    """Numpy keccak-f (fallback + the native kernel's test oracle)."""
    A = [states[:, i].copy() for i in range(25)]
    for rnd in range(24):
        # theta
        C = [A[x] ^ A[x + 5] ^ A[x + 10] ^ A[x + 15] ^ A[x + 20] for x in range(5)]
        D = [C[(x - 1) % 5] ^ _rotl(C[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                A[x + 5 * y] ^= D[x]
        # rho + pi: B[y, 2x+3y] = rot(A[x, y])
        B = [None] * 25
        for x in range(5):
            for y in range(5):
                B[y + 5 * ((2 * x + 3 * y) % 5)] = _rotl(A[x + 5 * y], _ROT[x][y])
        # chi
        for x in range(5):
            for y in range(5):
                A[x + 5 * y] = B[x + 5 * y] ^ (~B[(x + 1) % 5 + 5 * y] & B[(x + 2) % 5 + 5 * y])
        # iota
        A[0] = A[0] ^ _RC[rnd]
    return np.stack(A, axis=1)


_RATE_BYTES = 136  # keccak-256 rate


def keccak256_batch(data: np.ndarray) -> np.ndarray:
    """Keccak-256 of n equal-length messages. data: [n, L] u8 -> [n, 32] u8."""
    n, L = data.shape
    # pad10*1 with 0x01 domain byte (original Keccak)
    padded_len = ((L // _RATE_BYTES) + 1) * _RATE_BYTES
    padded = np.zeros((n, padded_len), dtype=np.uint8)
    padded[:, :L] = data
    padded[:, L] ^= 0x01
    padded[:, padded_len - 1] ^= 0x80

    states = np.zeros((n, 25), dtype=np.uint64)
    for block in range(padded_len // _RATE_BYTES):
        chunk = np.ascontiguousarray(
            padded[:, block * _RATE_BYTES:(block + 1) * _RATE_BYTES]
        )
        lanes64 = chunk.view("<u8").reshape(n, _RATE_BYTES // 8)
        states[:, :_RATE_BYTES // 8] ^= lanes64
        states = keccak_f(states)
    return np.ascontiguousarray(states[:, :4]).view(np.uint8).reshape(n, 32)


def keccak256(data: bytes) -> bytes:
    arr = np.frombuffer(bytes(data), dtype=np.uint8).reshape(1, -1) if data else \
        np.zeros((1, 0), dtype=np.uint8)
    return keccak256_batch(arr)[0].tobytes()


# -- KeccakHash<N> (reference hash/keccak.rs:100-130) -------------------------


def felts_to_bytes(inputs: list[int]) -> bytes:
    return b"".join(int(x).to_bytes(8, "little") for x in inputs)


def hash_no_pad(inputs: list[int], n: int = 25) -> bytes:
    return keccak256(felts_to_bytes(inputs))[:n]


def two_to_one(left: bytes, right: bytes) -> bytes:
    return keccak256(left + right)[: len(left)]


def bytes_digest_to_felts(digest: bytes) -> list[int]:
    """7-byte chunks to avoid collisions (reference hash_types.rs:184-194)."""
    out = []
    for i in range(0, len(digest), 7):
        chunk = digest[i:i + 7]
        out.append(int.from_bytes(chunk + b"\x00" * (8 - len(chunk)), "little"))
    return out


def permute(state: list[int]) -> list[int]:
    """Keccak pseudo-permutation for the challenger: hash-onion + rejection
    sampling (reference hash/keccak.rs:63-98)."""
    state_bytes = felts_to_bytes(state)
    out: list[int] = []
    while len(out) < 12:
        digest = keccak256(state_bytes)
        state_bytes = digest
        for i in range(0, 32, 8):
            word = int.from_bytes(digest[i:i + 8], "little")
            if word < fs.P:
                out.append(word)
    return out[:12]
