"""Poseidon-Goldilocks permutation: host scalar + batched device versions.

The straightforward round schedule (constant layer, S-box layer, MDS layer;
partial rounds S-box only lane 0) — algebraically identical to the reference's
fast-partial-round decomposition (reference hash/poseidon.rs:767-777
`poseidon()` vs `:791` `poseidon_naive()`, proven equal by its consistency
test), so outputs are bit-exact while staying fully vectorizable.

Device version operates on state shape [..., 12] uint64, one lane per field
element, batched over leading axes — the whole Merkle layer hashes in one call.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.hash.poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_CAPACITY,
    SPONGE_RATE,
    SPONGE_WIDTH,
)

P = fs.P
W = SPONGE_WIDTH

# ---------------------------------------------------------------------------
# Host scalar permutation (python ints) — used by the Fiat-Shamir challenger.
# ---------------------------------------------------------------------------

# MDS as a full 12x12 matrix of small ints: M[r][i] = CIRC[(i - r) % 12] + (i==r)*DIAG[r]
_MDS = [
    [MDS_MATRIX_CIRC[(i - r) % W] + (MDS_MATRIX_DIAG[r] if i == r else 0) for i in range(W)]
    for r in range(W)
]


def _sbox(x: int) -> int:
    x2 = (x * x) % P
    x3 = (x2 * x) % P
    return (x3 * x3 % P) * x % P  # x^7


def permute(state: list[int] | tuple[int, ...]) -> list[int]:
    """One full 30-round Poseidon permutation over 12 canonical u64 ints."""
    s = list(state)
    rc = 0
    for rnd in range(N_ROUNDS):
        full = rnd < HALF_N_FULL_ROUNDS or rnd >= HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
        s = [(x + ALL_ROUND_CONSTANTS[i + W * rnd]) % P for i, x in enumerate(s)]
        if full:
            s = [_sbox(x) for x in s]
        else:
            s[0] = _sbox(s[0])
        s = [sum(_MDS[r][i] * s[i] for i in range(W)) % P for r in range(W)]
        rc += 1
    return s


# ---------------------------------------------------------------------------
# Batched device permutation: state [..., 12] uint64.
# ---------------------------------------------------------------------------

_RC_DEV = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, W)


def _sbox_dev(x):
    x2 = g.mul(x, x)
    x3 = g.mul(x2, x)
    return g.mul(g.mul(x3, x3), x)


def _mds_limb_accum(v):
    """sum_i CIRC[i] * roll(v, -i) + diag, for one 32-bit limb plane.

    Exploits the circulant structure: out[r] = sum_i CIRC[i]*v[(r+i)%12]
    (+ DIAG[0]*v[0] at r=0). Entries <= 41, so accumulations stay under
    2^42 — exact in u64. (TPU's x64 rewriter has no u64 dot_general, so
    this is rolls + scaled adds, which XLA fuses into one VPU loop.)
    """
    acc = v * np.uint64(MDS_MATRIX_CIRC[0])
    for i in range(1, W):
        acc = acc + jnp.roll(v, -i, axis=-1) * np.uint64(MDS_MATRIX_CIRC[i])
    diag = jnp.concatenate(
        [v[..., 0:1] * np.uint64(MDS_MATRIX_DIAG[0]), jnp.zeros_like(v[..., 1:])],
        axis=-1,
    )
    return acc + diag


def _mds_dev(state):
    """MDS layer: out[..., r] = sum_i M[r,i] * state[..., i] mod p."""
    lo = state & g.MASK32
    hi = state >> g._32
    acc_lo = _mds_limb_accum(lo)
    acc_hi = _mds_limb_accum(hi)
    # value = acc_lo + acc_hi * 2^32  (fits in 106 bits -> reduce via limbs)
    hs_lo = acc_hi & g.MASK32
    hs_hi = acc_hi >> g._32
    # acc_lo < 2^42, hs_lo << 32 <= 2^64 - 2^32  => sum < 2^64, no overflow
    t = acc_lo + (hs_lo << g._32)
    over = t < acc_lo
    t = jnp.where(over, t + g.EPSILON, t)
    # + hs_hi * 2^64 = + hs_hi * EPSILON (hs_hi < 2^10)
    t2 = t + hs_hi * g.EPSILON
    over2 = t2 < t
    t2 = jnp.where(over2, t2 + g.EPSILON, t2)
    return g.canonicalize(t2)


_IS_FULL = np.array(
    [r < HALF_N_FULL_ROUNDS or r >= HALF_N_FULL_ROUNDS + N_PARTIAL_ROUNDS
     for r in range(N_ROUNDS)]
)


def permute_dev(state):
    """Batched Poseidon permutation; state [..., 12] uint64 canonical.

    Rounds run under lax.scan with a single round body (XLA's u64->u32
    legalization is superlinear in graph size; 30 unrolled rounds take
    minutes to compile, one scanned body takes seconds). Partial rounds
    compute the S-box on all lanes and select lane 0 — wasted VPU lanes,
    but branch-free and uniform.
    """
    import jax

    rc = jnp.asarray(_RC_DEV)
    is_full = jnp.asarray(_IS_FULL)
    lane0 = jax.lax.broadcasted_iota(jnp.int32, (W,), 0) == 0

    def round_body(s, inp):
        rc_row, full = inp
        s = g.add(s, rc_row)
        sb = _sbox_dev(s)
        s = jnp.where(jnp.logical_or(full, lane0), sb, s)
        return _mds_dev(s), None

    out, _ = jax.lax.scan(round_body, state, (rc, is_full))
    return out


# ---------------------------------------------------------------------------
# Sponge hashing (overwrite mode, no padding) — reference hash/hashing.rs:118.
# ---------------------------------------------------------------------------

def hash_n_to_m_no_pad(inputs: list[int], num_outputs: int) -> list[int]:
    """Host sponge: absorb in rate-8 chunks (overwrite), squeeze num_outputs."""
    state = [0] * W
    for i in range(0, len(inputs), SPONGE_RATE):
        chunk = inputs[i : i + SPONGE_RATE]
        state[: len(chunk)] = chunk
        state = permute(state)
    outputs = []
    while True:
        for x in state[:SPONGE_RATE]:
            outputs.append(x)
            if len(outputs) == num_outputs:
                return outputs
        state = permute(state)


def hash_no_pad(inputs: list[int]) -> list[int]:
    """4-felt digest (HashOut) of the input sequence."""
    return hash_n_to_m_no_pad(inputs, 4)


def hash_or_noop(inputs: list[int]) -> list[int]:
    """<=4 felts pass through zero-padded; longer inputs are hashed
    (reference plonk/config.rs:63-74)."""
    if len(inputs) <= 4:
        return list(inputs) + [0] * (4 - len(inputs))
    return hash_no_pad(inputs)


def two_to_one(left: list[int], right: list[int]) -> list[int]:
    """Compress two 4-felt digests (reference hash/hashing.rs:97)."""
    return hash_no_pad(list(left) + list(right))
