"""Fused Poseidon sponge kernel (Pallas/Mosaic).

Hashes a batch of leaves (columns of a [width, N] Goldilocks matrix) to
4-felt digests with the WHOLE sponge — all absorb chunks and all 30 rounds
per chunk — resident in VMEM: one HBM read of the leaf block and one digest
write per 1024-leaf block, instead of one state read+write per round under
plain XLA.

Layout: states live STATE-MAJOR as two u32 limb stacks [12, 8, 128] (Mosaic
has no u64) so the leaf batch owns the native (sublane, lane) tile. The MDS
layer exploits the small circulant constants (reference
hash/poseidon_goldilocks.rs:24-25, entries <= 41): each input row splits
into four 16-bit limb planes and the 12x12 mix runs as exact u32
multiply-accumulates (column sums < 2^26), recombined with one reduce128 per
output row. S-boxes are x^7 chains on limb planes; partial rounds touch only
state row 0 (algebraically identical to the reference's fast-partial-round
decomposition, reference hash/poseidon.rs:767-791).

The same kernel serves leaf hashing (width 135 -> 17 absorb chunks) and
Merkle 2-to-1 compression (width 8 -> 1 chunk), matching
`hash_n_to_m_no_pad` overwrite-mode semantics (reference hash/hashing.rs:118).
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from plonky2_tpu.hash.poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    N_ROUNDS,
    SPONGE_WIDTH,
)
from plonky2_tpu.ops.goldilocks_limbs import gl_add, gl_mul, reduce128

W = SPONGE_WIDTH
_LANE = 128
_SUB = 8
_BLK = _SUB * _LANE  # states per grid step
LO16 = np.uint32(0xFFFF)
_16 = np.uint32(16)
ZERO = np.uint32(0)

_MDS = [
    [MDS_MATRIX_CIRC[(i - r) % W] + (MDS_MATRIX_DIAG[r] if i == r else 0)
     for i in range(W)]
    for r in range(W)
]


def _mds_planes(st_lo, st_hi):
    """MDS layer on stacked [12, 8, 128] limb planes via 16-bit limbs."""
    limbs = []
    for j in range(W):
        lo, hi = st_lo[j], st_hi[j]
        limbs.append((lo & LO16, lo >> _16, hi & LO16, hi >> _16))
    out_lo, out_hi = [], []
    for r in range(W):
        acc = [None, None, None, None]
        for j in range(W):
            m = np.uint32(_MDS[r][j])
            for k in range(4):
                t = limbs[j][k] * m
                acc[k] = t if acc[k] is None else acc[k] + t
        a0, a1, a2, a3 = acc  # each < 2^26
        s0 = a0 + (a1 << _16)
        c0 = (s0 < a0).astype(jnp.uint32)
        h0 = (a1 >> _16) + a2 + c0
        s1 = h0 + (a3 << _16)
        c1 = (s1 < h0).astype(jnp.uint32)
        top = (a3 >> _16) + c1
        lo, hi = reduce128(s0, s1, top, ZERO)
        out_lo.append(lo)
        out_hi.append(hi)
    return jnp.stack(out_lo), jnp.stack(out_hi)


def _sbox(lo, hi):
    x2 = gl_mul(lo, hi, lo, hi)
    x3 = gl_mul(*x2, lo, hi)
    x6 = gl_mul(*x3, *x3)
    return gl_mul(*x6, lo, hi)


def _loop_i32(lo: int, hi: int, body, init):
    """fori_loop with a guaranteed-i32 index: under x64 fori_loop
    canonicalizes its counter to i64, which Mosaic can neither convert nor
    use for SMEM/dynamic-slice indexing."""

    def cond(s):
        return s[0] < np.int32(hi)

    def step(s):
        i, st = s
        return (i + np.int32(1), body(i, st))

    return lax.while_loop(cond, step, (np.int32(lo), init))[1]


def _permute_body(rc_lo_ref, rc_hi_ref, st_lo, st_hi):
    """All 30 rounds on VMEM-resident planes; round constants from SMEM."""
    h = HALF_N_FULL_ROUNDS
    p = N_PARTIAL_ROUNDS

    def add_rc(r, st_lo, st_hi):
        outs = [gl_add(st_lo[j], st_hi[j], rc_lo_ref[r, j], rc_hi_ref[r, j])
                for j in range(W)]
        return [o[0] for o in outs], [o[1] for o in outs]

    def full_round(r, st):
        st_lo, st_hi = st
        rlo, rhi = add_rc(r, st_lo, st_hi)
        rows = [_sbox(rlo[j], rhi[j]) for j in range(W)]
        st_lo = jnp.stack([l for l, _ in rows])
        st_hi = jnp.stack([h for _, h in rows])
        return _mds_planes(st_lo, st_hi)

    def partial_round(r, st):
        st_lo, st_hi = st
        rlo, rhi = add_rc(r, st_lo, st_hi)
        s0 = _sbox(rlo[0], rhi[0])
        st_lo = jnp.stack([s0[0]] + rlo[1:])
        st_hi = jnp.stack([s0[1]] + rhi[1:])
        return _mds_planes(st_lo, st_hi)

    # i32 loop bounds: x64 would make the index i64, which Mosaic cannot
    # convert or use in SMEM indexing.
    st = (st_lo, st_hi)
    st = _loop_i32(0, h, full_round, st)
    st = _loop_i32(h, h + p, partial_round, st)
    st = _loop_i32(h + p, N_ROUNDS, full_round, st)
    return st


@functools.lru_cache(maxsize=None)
def _make_sponge_kernel(width: int, chunks: int):
    # Memoized so repeated calls with the same shape reuse ONE kernel
    # function object — pallas_call's jit cache keys on kernel identity,
    # and an interpret-mode cache miss costs a ~70s XLA:CPU compile.
    def kernel(rc_lo_ref, rc_hi_ref, in_lo_ref, in_hi_ref,
               out_lo_ref, out_hi_ref):
        zeros = jnp.zeros((W, _SUB, _LANE), jnp.uint32)
        st_lo, st_hi = zeros, zeros

        def chunk_body(c, st):
            st_lo, st_hi = st
            base = c * np.int32(8)
            nlo = in_lo_ref[pl_ds(base, 8), 0]
            nhi = in_hi_ref[pl_ds(base, 8), 0]
            if width % 8 != 0:
                row_ids = lax.broadcasted_iota(jnp.int32, (8, 1, 1), 0) + base
                valid = row_ids < width
                nlo = jnp.where(valid, nlo, st_lo[:8])
                nhi = jnp.where(valid, nhi, st_hi[:8])
            st_lo = jnp.concatenate([nlo, st_lo[8:]], axis=0)
            st_hi = jnp.concatenate([nhi, st_hi[8:]], axis=0)
            return _permute_body(rc_lo_ref, rc_hi_ref, st_lo, st_hi)

        st_lo, st_hi = _loop_i32(0, chunks, chunk_body, (st_lo, st_hi))
        out_lo_ref[...] = st_lo[:4].reshape(4, 1, _SUB, _LANE)
        out_hi_ref[...] = st_hi[:4].reshape(4, 1, _SUB, _LANE)

    return kernel


def pl_ds(start, size):
    import jax.experimental.pallas as pl

    return pl.ds(start, size)


_RC = np.array(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(N_ROUNDS, W)
_RC_LO = (_RC & np.uint64(0xFFFFFFFF)).astype(np.uint32)
_RC_HI = (_RC >> np.uint64(32)).astype(np.uint32)


# x64 mode makes Python-int index components trace as i64 — pin to i32.
def _i32(x):
    return jnp.asarray(x, jnp.int32)


_Z = np.int32(0)


def _compile_kwargs(interpret: bool) -> dict:
    if interpret:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024)}


def _sponge_call(lo, hi, width: int, interpret: bool):
    """lo/hi: [wpad, nB, 8, 128] -> digest planes [4, nB, 8, 128].

    Not jitted here: interpret mode runs eagerly (XLA:CPU compile of the
    fully inlined kernel is pathologically slow); on TPU callers sit under
    their own jit (or the pallas_call compiles standalone)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wpad, nB = lo.shape[0], lo.shape[1]
    chunks = wpad // 8
    # Explicit i32 index map: the default one returns i64 under x64, which
    # Mosaic cannot legalize in func.return.
    rcspec = pl.BlockSpec((N_ROUNDS, W), lambda i: (_Z, _Z),
                          memory_space=pltpu.SMEM)
    inspec = pl.BlockSpec((wpad, 1, _SUB, _LANE),
                          lambda i: (_Z, _i32(i), _Z, _Z))
    ospec = pl.BlockSpec((4, 1, _SUB, _LANE), lambda i: (_Z, _i32(i), _Z, _Z))
    return pl.pallas_call(
        _make_sponge_kernel(width, chunks),
        grid=(nB,),
        in_specs=[rcspec, rcspec, inspec, inspec],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((4, nB, _SUB, _LANE), jnp.uint32)] * 2,
        interpret=interpret,
        **_compile_kwargs(interpret),
    )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)


def sponge_pallas(cols: jax.Array, interpret: bool = False) -> jax.Array:
    """Overwrite-mode sponge over [width, N] u64 columns -> [4, N] digests.

    Drop-in device dual of `hash_n_to_m_no_pad(col, 4)` per column."""
    width, n = cols.shape
    wpad = -(-width // 8) * 8
    npad = -(-n // _BLK) * _BLK
    x = cols
    if wpad != width or npad != n:
        x = jnp.pad(x, ((0, wpad - width), (0, npad - n)))
    mask = np.uint64(0xFFFFFFFF)
    lo = (x & mask).astype(jnp.uint32).reshape(wpad, npad // _BLK, _SUB, _LANE)
    hi = (x >> np.uint64(32)).astype(jnp.uint32).reshape(
        wpad, npad // _BLK, _SUB, _LANE)
    olo, ohi = _sponge_call(lo, hi, width, interpret)
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << np.uint64(32))
    return out.reshape(4, npad)[:, :n]


# "auto": on when running on real TPU; "1": always; "0": never.
_FLAG = os.environ.get("PLONKY2_TPU_PALLAS_POSEIDON",
                       os.environ.get("PLONKY2_TPU_PALLAS", "auto"))
_INTERPRET = False
_MIN_N = 8  # pallas wins from tiny sizes: one launch vs ~400 small-op launches


def enabled() -> bool:
    if _FLAG == "0":
        return False
    if _FLAG == "1":
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def should_use(n: int, width: int) -> bool:
    return width > 4 and n >= _MIN_N and enabled()


def _make_permute_kernel():
    def kernel(rc_lo_ref, rc_hi_ref, in_lo_ref, in_hi_ref,
               out_lo_ref, out_hi_ref):
        st_lo = in_lo_ref[:, 0]
        st_hi = in_hi_ref[:, 0]
        st_lo, st_hi = _permute_body(rc_lo_ref, rc_hi_ref, st_lo, st_hi)
        out_lo_ref[...] = st_lo.reshape(W, 1, _SUB, _LANE)
        out_hi_ref[...] = st_hi.reshape(W, 1, _SUB, _LANE)

    return kernel


_PERMUTE_KERNEL = None


def permute_pallas(state_sm: jax.Array, interpret: bool = False) -> jax.Array:
    """Full 30-round Poseidon permutation, state-major [12, N] u64 -> same.

    One kernel launch for the whole permutation; the plain-XLA dual
    (hash.poseidon.permute_dev_sm) emits hundreds of small ops whose launch
    latency dominates for the small batches inside fused prover programs
    (device challenger duplexes, small Merkle levels)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    global _PERMUTE_KERNEL
    if _PERMUTE_KERNEL is None:
        _PERMUTE_KERNEL = _make_permute_kernel()

    w, n = state_sm.shape
    assert w == W
    npad = -(-n // _BLK) * _BLK
    x = state_sm if npad == n else jnp.pad(state_sm, ((0, 0), (0, npad - n)))
    mask = np.uint64(0xFFFFFFFF)
    nB = npad // _BLK
    lo = (x & mask).astype(jnp.uint32).reshape(W, nB, _SUB, _LANE)
    hi = (x >> np.uint64(32)).astype(jnp.uint32).reshape(W, nB, _SUB, _LANE)
    rcspec = pl.BlockSpec((N_ROUNDS, W), lambda i: (_Z, _Z),
                          memory_space=pltpu.SMEM)
    vspec = pl.BlockSpec((W, 1, _SUB, _LANE), lambda i: (_Z, _i32(i), _Z, _Z))
    olo, ohi = pl.pallas_call(
        _PERMUTE_KERNEL,
        grid=(nB,),
        in_specs=[rcspec, rcspec, vspec, vspec],
        out_specs=[vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((W, nB, _SUB, _LANE), jnp.uint32)] * 2,
        interpret=interpret,
        **_compile_kwargs(interpret),
    )(jnp.asarray(_RC_LO), jnp.asarray(_RC_HI), lo, hi)
    out = olo.astype(jnp.uint64) | (ohi.astype(jnp.uint64) << np.uint64(32))
    return out.reshape(W, npad)[:, :n]
