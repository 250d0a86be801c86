"""Batched NTT / iNTT / coset LDE over Goldilocks (device, jit-friendly).

Semantics match the reference (field/src/fft.rs): `fft` maps coefficients to
evaluations over the order-n two-adic subgroup in natural order
(values[i] = P(g^i)); `ifft` is its inverse; `coset_fft` evaluates on
shift * <g>; LDE zero-pads by `rate_bits` and exploits the zero tail so the
first `rate_bits` stages collapse to a broadcast (reference fft.rs:165-202) —
re-derived here as `repeat` of the bit-reversed short input.

Shape convention: transform along the LAST axis; leading axes are batch
(typically [num_polys, n]) — all 100+ column polynomials of a commitment
transform in one fused XLA program. Stages are unrolled at trace time
(static shapes), so each (lg_n, batch) signature compiles once.

Twiddle/permutation tables are precomputed host-side per size and closed over
as constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import scalar as fs


@functools.lru_cache(maxsize=None)
def bit_reverse_perm(lg_n: int) -> np.ndarray:
    """Permutation p with p[i] = reverse of i's lg_n-bit representation."""
    n = 1 << lg_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.int32)
    for b in range(lg_n):
        rev |= (((idx >> b) & 1) << (lg_n - 1 - b)).astype(np.int32)
    return rev


@functools.lru_cache(maxsize=None)
def _stage_twiddles(lg_n: int, inverse: bool = False) -> tuple[np.ndarray, ...]:
    """Twiddle row per stage s=1..lg_n: [g_{2^s}^j for j < 2^(s-1)].

    inverse=True uses g_{2^s}^{-1} — the butterfly network then computes the
    un-normalized inverse NTT (the 1/n factor is folded in elsewhere)."""
    rows = []
    for s in range(1, lg_n + 1):
        root = fs.primitive_root_of_unity(s)
        if inverse:
            root = fs.inverse(root)
        rows.append(g.np_powers(root, 1 << (s - 1)))
    return tuple(rows)


def _butterflies(v: jax.Array, lg_n: int, start_stage: int) -> jax.Array:
    """Run DIT stages start_stage+1 .. lg_n on bit-reversed-order input."""
    n = 1 << lg_n
    batch = v.shape[:-1]
    tw = _stage_twiddles(lg_n)
    for s in range(start_stage + 1, lg_n + 1):
        half = 1 << (s - 1)
        w = jnp.asarray(tw[s - 1])  # [half]
        vv = v.reshape(batch + (n >> s, 2, half))
        even = vv[..., 0, :]
        odd = vv[..., 1, :]
        t = g.mul(odd, w)
        v = jnp.stack([g.add(even, t), g.sub(even, t)], axis=-2).reshape(batch + (n,))
    return v


def _butterflies0(v: jax.Array, lg_m: int, start_stage: int = 0,
                  inverse: bool = False) -> jax.Array:
    """DIT stages over AXIS 0 of [m, V...] (input bit-reversed along axis 0).

    The transform axis is never minor-most, so every butterfly is an
    elementwise op over [*, V] tiles with the vector axis V on lanes — the
    layout that keeps the TPU VPU fed (vs. the last-axis form whose early
    stages have tiny minor dims). On real TPU the whole stage loop runs as
    ONE fused Pallas kernel (plonky2_tpu.ops.pallas_ntt) — a single HBM
    read+write instead of one per stage."""
    from plonky2_tpu.ops import pallas_ntt as _pn

    if _pn.should_use(lg_m, start_stage):
        return _pn.butterflies0_pallas(v, lg_m, start_stage,
                                       interpret=_pn._INTERPRET,
                                       inverse=inverse)
    m = v.shape[0]
    rest = v.shape[1:]
    tw = _stage_twiddles(lg_m, inverse)
    wshape = (1, -1) + (1,) * len(rest)
    for s in range(start_stage + 1, lg_m + 1):
        half = 1 << (s - 1)
        w = jnp.asarray(tw[s - 1]).reshape(wshape)  # [1, half, 1...]
        vv = v.reshape((m >> s, 2, half) + rest)
        even = vv[:, 0]
        odd = vv[:, 1]
        t = g.mul(odd, w)
        v = jnp.stack([g.add(even, t), g.sub(even, t)], axis=1).reshape((m,) + rest)
    return v


_FOUR_STEP_MIN = 1 << 10


def _fft_four_step(coeffs: jax.Array, inverse: bool = False) -> jax.Array:
    """Bailey four-step NTT over the last axis: two passes of axis-0
    transforms (each vectorized over the complementary axis), one twiddle
    multiply, reshape-only data movement.

    inverse=True computes the full inverse NTT (root inverted in every
    twiddle table, 1/n folded into the mid twiddle — which touches every
    element exactly once), so no reversal/scale epilogue pass is needed."""
    n = coeffs.shape[-1]
    lg_n = n.bit_length() - 1
    lg_a = (lg_n + 1) // 2
    a, b = 1 << lg_a, n >> lg_a
    lg_b = lg_n - lg_a
    batch = coeffs.shape[:-1]
    B = int(np.prod(batch)) if batch else 1

    x = coeffs.reshape(B, a, b)
    # phase 1: NTT_a over i1, vectorized over (B, b)
    y = jnp.transpose(x, (1, 0, 2)).reshape(a, B * b)
    y = jnp.take(y, jnp.asarray(bit_reverse_perm(lg_a)), axis=0)
    A = _butterflies0(y, lg_a, inverse=inverse).reshape(a, B, b)  # A[k1, B, i2]
    # twiddle: w_n^{±k1 * i2} (· 1/n when inverse)
    A = g.mul(A, jnp.asarray(_four_step_twiddles(lg_n, lg_a, inverse))[:, None, :])
    # phase 2: NTT_b over i2, vectorized over (B, a)
    z = jnp.transpose(A, (2, 1, 0)).reshape(b, B * a)
    z = jnp.take(z, jnp.asarray(bit_reverse_perm(lg_b)), axis=0)
    C = _butterflies0(z, lg_b, inverse=inverse).reshape(b, B, a)  # C[k2, B, k1]
    # output index k = k1 + a*k2 -> [k2, k1] row-major
    return jnp.transpose(C, (1, 0, 2)).reshape(batch + (n,))


@functools.lru_cache(maxsize=None)
def _four_step_twiddles(lg_n: int, lg_a: int, inverse: bool = False) -> np.ndarray:
    """[a, b] table w_n^{k1*i2}; inverse: w_n^{-k1*i2} / n."""
    n = 1 << lg_n
    a = 1 << lg_a
    b = n >> lg_a
    w = fs.primitive_root_of_unity(lg_n)
    if inverse:
        w = fs.inverse(w)
    row = g.np_powers(w, b).astype(object)  # w^{i2}
    out = np.empty((a, b), dtype=np.uint64)
    cur = np.full(b, fs.inverse(n % fs.P) if inverse else 1, dtype=object)
    for k1 in range(a):
        out[k1] = (cur % fs.P).astype(np.uint64)
        cur = (cur * row) % fs.P
    return out


def fft(coeffs: jax.Array) -> jax.Array:
    """coefficients -> evaluations on <g_n>, natural order. Last-axis length 2^k."""
    n = coeffs.shape[-1]
    lg_n = n.bit_length() - 1
    assert 1 << lg_n == n, "length must be a power of two"
    if n >= _FOUR_STEP_MIN:
        from plonky2_tpu.ops import pallas_ntt as _pn

        batch = coeffs.shape[:-1]
        B = int(np.prod(batch)) if batch else 1
        if _pn.enabled() and _pn.fourstep_supported(lg_n, B):
            return _pn.fft_four_step_pallas(coeffs, interpret=_pn._INTERPRET)
        return _fft_four_step(coeffs)
    v = jnp.take(coeffs, jnp.asarray(bit_reverse_perm(lg_n)), axis=-1)
    return _butterflies(v, lg_n, 0)


def ifft(values: jax.Array) -> jax.Array:
    """evaluations -> coefficients (inverse of fft).

    ifft(a)[i] = fft(a)[(n-i) mod n] / n (reference field/src/fft.rs:64-91).
    Large sizes run the four-step network directly with inverted twiddles
    and 1/n folded into the mid twiddle table — identical values, but no
    reversal gather or scale pass over HBM.
    """
    n = values.shape[-1]
    lg_n = n.bit_length() - 1
    assert 1 << lg_n == n, "length must be a power of two"
    if n >= _FOUR_STEP_MIN:
        from plonky2_tpu.ops import pallas_ntt as _pn

        batch = values.shape[:-1]
        B = int(np.prod(batch)) if batch else 1
        if _pn.enabled() and _pn.fourstep_supported(lg_n, B):
            return _pn.fft_four_step_pallas(values, interpret=_pn._INTERPRET,
                                            inverse=True)
        return _fft_four_step(values, inverse=True)
    f = fft(values)
    rev = jnp.roll(jnp.flip(f, axis=-1), 1, axis=-1)  # rev[i] = f[(n-i) % n]
    n_inv = fs.inverse(n % fs.P)
    return g.mul(rev, jnp.asarray(np.uint64(n_inv)))


@functools.lru_cache(maxsize=None)
def _shift_powers(shift: int, n: int, inverse: bool = False) -> np.ndarray:
    base = fs.inverse(shift) if inverse else shift
    return g.np_powers(base, n)


def coset_fft(coeffs: jax.Array, shift: int | None = None) -> jax.Array:
    """Evaluate on the coset shift * <g_n> (default shift = field generator)."""
    if shift is None:
        shift = fs.MULTIPLICATIVE_GROUP_GENERATOR
    n = coeffs.shape[-1]
    scaled = g.mul(coeffs, jnp.asarray(_shift_powers(shift, n)))
    return fft(scaled)


def coset_ifft(values: jax.Array, shift: int | None = None) -> jax.Array:
    if shift is None:
        shift = fs.MULTIPLICATIVE_GROUP_GENERATOR
    n = values.shape[-1]
    coeffs = ifft(values)
    return g.mul(coeffs, jnp.asarray(_shift_powers(shift, n, inverse=True)))


def lde_fft(coeffs: jax.Array, rate_bits: int, shift: int | None = None) -> jax.Array:
    """Low-degree extension: evaluate degree<m poly on (shifted) subgroup of
    size m << rate_bits.

    Zero-tail optimization: the padded input's first `rate_bits` DIT stages
    only duplicate values, so we bit-reverse the m coefficients and repeat
    each 2^rate_bits times, then run the remaining stages.
    """
    m = coeffs.shape[-1]
    lg_m = m.bit_length() - 1
    assert 1 << lg_m == m
    lg_n = lg_m + rate_bits
    if (1 << lg_n) >= _FOUR_STEP_MIN and rate_bits > 0:
        # Interleaved-coset form: the n-point LDE splits into 2^rate
        # independent m-point coset FFTs (out[s*2^rate + j] = F_j[s] with
        # F_j = fft(coeffs * powers(shift * w_n^j))) — one batched fft with
        # lane-friendly layouts, same total butterfly work as the zero-tail
        # trick (reference fft.rs:165-202).
        table = jnp.asarray(_lde_coset_scale_table(shift or 1, lg_m, rate_bits))
        from plonky2_tpu.ops import pallas_ntt as _pn

        R = 1 << rate_bits
        B = R * int(np.prod(coeffs.shape[:-1]))
        if _pn.enabled() and _pn.fourstep_supported(lg_m, B):
            # fully fused path: coset scaling is the kernel prologue and the
            # final swapaxes rides the four-step's own output transpose
            return _pn.fft_four_step_pallas(coeffs, interpret=_pn._INTERPRET,
                                            interleave=R, scale=table)
        scaled = g.mul(coeffs[..., None, :], table)  # [..., R, m]
        ev = fft(scaled)
        return jnp.swapaxes(ev, -1, -2).reshape(coeffs.shape[:-1] + (1 << lg_n,))
    if shift is not None and shift != 1:
        coeffs = g.mul(coeffs, jnp.asarray(_shift_powers(shift, m)))
    v = jnp.take(coeffs, jnp.asarray(bit_reverse_perm(lg_m)), axis=-1)
    v = jnp.repeat(v, 1 << rate_bits, axis=-1)
    return _butterflies(v, lg_n, rate_bits)


@functools.lru_cache(maxsize=None)
def _lde_coset_scale_table(shift: int, lg_m: int, rate_bits: int) -> np.ndarray:
    """[2^rate, m] table: row j = powers of (shift * w_n^j)."""
    m = 1 << lg_m
    r = 1 << rate_bits
    w_n = fs.primitive_root_of_unity(lg_m + rate_bits)
    out = np.empty((r, m), dtype=np.uint64)
    for j in range(r):
        out[j] = g.np_powers(fs.mul(shift % fs.P, fs.exp(w_n, j)), m)
    return out


def coset_lde(coeffs: jax.Array, rate_bits: int) -> jax.Array:
    """LDE onto the g-shifted coset (the FRI evaluation domain)."""
    return lde_fft(coeffs, rate_bits, shift=fs.MULTIPLICATIVE_GROUP_GENERATOR)
