"""Hasher objects — the runtime analog of the reference's `Hasher` trait
(reference plonk/config.rs:36-126).

Digest representations: PoseidonHasher digests are 4-felt lists (HashOut);
KeccakHasher digests are `bytes` of length HASH_SIZE (BytesHash). The
challenger and serialization dispatch on the representation.
"""

from __future__ import annotations

import numpy as np

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.hash import keccak as kk
from plonky2_tpu.hash import poseidon as ps


class PoseidonHasher:
    """Poseidon-12 sponge hasher (algebraic — supports recursion)."""

    HASH_SIZE = 32
    algebraic = True
    name = "PoseidonHash"

    @staticmethod
    def hash_no_pad(inputs: list[int]) -> list[int]:
        return ps.hash_no_pad(inputs)

    @staticmethod
    def hash_pad(inputs: list[int]) -> list[int]:
        return ps.hash_no_pad(_pad_10_1(inputs))

    @staticmethod
    def hash_or_noop(inputs: list[int]) -> list[int]:
        return ps.hash_or_noop(inputs)

    @staticmethod
    def two_to_one(left, right) -> list[int]:
        return ps.two_to_one(left, right)

    @staticmethod
    def permute(state: list[int]) -> list[int]:
        return ps.permute(state)

    @staticmethod
    def digest_to_felts(digest) -> list[int]:
        return list(digest)


class KeccakHasher:
    """Truncated keccak-256 (host-side, numpy-vectorized for trees;
    reference hash/keccak.rs). Non-algebraic: native verification only."""

    HASH_SIZE = 25
    algebraic = False
    name = "KeccakHash<25>"

    @staticmethod
    def hash_no_pad(inputs: list[int]) -> bytes:
        return kk.hash_no_pad(inputs, KeccakHasher.HASH_SIZE)

    @staticmethod
    def hash_pad(inputs: list[int]) -> bytes:
        return kk.hash_no_pad(_pad_10_1(inputs), KeccakHasher.HASH_SIZE)

    @staticmethod
    def hash_or_noop(inputs: list[int]) -> bytes:
        n = KeccakHasher.HASH_SIZE
        if len(inputs) * 8 <= n:
            out = bytearray(n)
            for i, x in enumerate(inputs):
                out[i * 8:(i + 1) * 8] = int(x).to_bytes(8, "little")
            return bytes(out)
        return KeccakHasher.hash_no_pad(inputs)

    @staticmethod
    def two_to_one(left: bytes, right: bytes) -> bytes:
        return kk.two_to_one(left, right)

    @staticmethod
    def permute(state: list[int]) -> list[int]:
        return kk.permute(state)

    @staticmethod
    def digest_to_felts(digest: bytes) -> list[int]:
        return kk.bytes_digest_to_felts(digest)

    # batch helpers for host Merkle trees
    @staticmethod
    def hash_leaves_batch(leaves: np.ndarray) -> np.ndarray:
        """[n, width] u64 -> [n, HASH_SIZE] u8."""
        n, width = leaves.shape
        hs = KeccakHasher.HASH_SIZE
        if width * 8 <= hs:
            out = np.zeros((n, hs), dtype=np.uint8)
            le = np.ascontiguousarray(leaves.astype("<u8")).view(np.uint8).reshape(n, width * 8)
            out[:, :width * 8] = le
            return out
        data = np.ascontiguousarray(leaves.astype("<u8")).view(np.uint8).reshape(n, width * 8)
        return kk.keccak256_batch(data)[:, :hs]

    @staticmethod
    def compress_batch(digests: np.ndarray) -> np.ndarray:
        """[2m, HASH_SIZE] u8 -> [m, HASH_SIZE] u8 parent digests."""
        m2, hs = digests.shape
        pairs = digests.reshape(m2 // 2, 2 * hs)
        return kk.keccak256_batch(pairs)[:, :hs]


def _pad_10_1(inputs: list[int]) -> list[int]:
    """pad10*1 over felts at rate 8 (reference plonk/config.rs:50-59)."""
    padded = list(inputs) + [1]
    while (len(padded) + 1) % 8 != 0:
        padded.append(0)
    padded.append(1)
    return padded


def observe_digest(challenger, digest) -> None:
    """Observe either digest representation into the transcript."""
    if isinstance(digest, (bytes, bytearray)):
        challenger.observe_elements(kk.bytes_digest_to_felts(bytes(digest)))
    else:
        challenger.observe_elements(list(digest))
