"""Goldilocks field algebra on u32 limb planes (for Pallas/Mosaic kernels).

Mosaic has no 64-bit integers, so kernels carry each element as two u32
planes (lo, hi). The identities mirror `plonky2_tpu.field.goldilocks`
(reference field/src/goldilocks_field.rs:245-303,402-415):

    p       = 2^64 - 2^32 + 1
    2^64    = EPSILON (mod p),  EPSILON = 2^32 - 1
    2^96    = -1      (mod p)

All helpers are shape-polymorphic pure jnp functions over uint32 arrays and
work both inside pallas kernels and in plain XLA programs; all outputs are
canonical (< p) given canonical inputs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

U32 = jnp.uint32
EPS32 = np.uint32(0xFFFFFFFF)  # EPSILON == 2^32 - 1, fits one u32 limb
LO16 = np.uint32(0xFFFF)
_16 = np.uint32(16)
ONE = np.uint32(1)
ZERO = np.uint32(0)


def _b2u(b):
    """bool -> u32 0/1."""
    return b.astype(U32)


def add64(alo, ahi, blo, bhi):
    """(a + b) mod 2^64 on limb planes -> (lo, hi, carry∈{0,1} u32)."""
    lo = alo + blo
    c0 = _b2u(lo < alo)
    h1 = ahi + bhi
    c1 = _b2u(h1 < ahi)
    hi = h1 + c0
    c2 = _b2u(hi < c0)
    return lo, hi, c1 + c2  # carries can't both fire


def sub64(alo, ahi, blo, bhi):
    """(a - b) mod 2^64 -> (lo, hi, borrow∈{0,1} u32)."""
    lo = alo - blo
    b0 = _b2u(alo < blo)
    h1 = ahi - bhi
    b1 = _b2u(ahi < bhi)
    hi = h1 - b0
    b2 = _b2u(h1 < b0)
    return lo, hi, b1 + b2


def canonicalize(lo, hi):
    """One conditional subtraction of p. x >= p iff hi == 2^32-1 and lo != 0
    (p's limbs are (1, 0xffffffff)), valid for any x < 2p. Select-free:
    subtracting p is lo -= 1 and hi += 1 (0xffffffff wraps to 0) exactly
    when the condition fires."""
    ge = _b2u((hi == EPS32) & (lo != ZERO))
    return lo - ge, hi + ge


def gl_add(alo, ahi, blo, bhi):
    """a + b mod p; canonical in/out."""
    lo, hi, c = add64(alo, ahi, blo, bhi)
    # overflow: true sum = 2^64 + s ≡ s + EPSILON, and s + EPSILON < p (no wrap)
    lo2 = lo + (c * EPS32)
    hi2 = hi + _b2u(lo2 < lo)
    return canonicalize(lo2, hi2)


def gl_sub(alo, ahi, blo, bhi):
    """a - b mod p; canonical in/out."""
    lo, hi, bo = sub64(alo, ahi, blo, bhi)
    # borrow: true diff = s - 2^64 ≡ s - EPSILON, and s >= 2^32 (no second borrow)
    e = bo * EPS32
    lo2 = lo - e
    hi2 = hi - _b2u(lo < e)
    return lo2, hi2


def mul32_wide(a, b):
    """Full 32x32 -> 64 product via 16-bit halves -> (lo, hi) u32."""
    a0 = a & LO16
    a1 = a >> _16
    b0 = b & LO16
    b1 = b >> _16
    m00 = a0 * b0
    m11 = a1 * b1
    m01 = a0 * b1
    m10 = a1 * b0
    mid = m01 + m10
    midc = _b2u(mid < m01)  # carry out of the 2^16-weighted column
    lo = m00 + (mid << _16)
    c = _b2u(lo < m00)
    hi = m11 + (mid >> _16) + (midc << _16) + c  # < 2^32, exact
    return lo, hi


def gl_mul(alo, ahi, blo, bhi):
    """a * b mod p: 128-bit limb product + reduce128; canonical in/out."""
    ll_lo, ll_hi = mul32_wide(alo, blo)
    lh_lo, lh_hi = mul32_wide(alo, bhi)
    hl_lo, hl_hi = mul32_wide(ahi, blo)
    hh_lo, hh_hi = mul32_wide(ahi, bhi)
    # accumulate 128-bit product words w0..w3
    w0 = ll_lo
    w1 = ll_hi + lh_lo
    c1 = _b2u(w1 < ll_hi)
    w1b = w1 + hl_lo
    c1 = c1 + _b2u(w1b < w1)
    w2 = hh_lo + lh_hi
    c2 = _b2u(w2 < hh_lo)
    w2b = w2 + hl_hi
    c2 = c2 + _b2u(w2b < w2)
    w2c = w2b + c1
    c2 = c2 + _b2u(w2c < c1)
    w3 = hh_hi + c2  # no overflow: hh_hi <= (2^16-1)^2 >> 16 territory
    return reduce128(w0, w1b, w2c, w3)


def reduce128(w0, w1, w2, w3):
    """Reduce w0 + w1*2^32 + w2*2^64 + w3*2^96 mod p (canonical output).

    value ≡ lo64 - w3 + w2*EPSILON, with lo64 = (w0, w1)
    (2^64 ≡ EPSILON, 2^96 ≡ -1 mod p)."""
    # t0 = lo64 - w3; on borrow subtract EPSILON once more (never re-borrows)
    t0lo, t0hi, bo = sub64(w0, w1, w3, ZERO)
    e = bo * EPS32
    t0lo2 = t0lo - e
    t0hi2 = t0hi - _b2u(t0lo < e)
    # t1 = w2 * EPSILON = (w2 << 32) - w2
    t1lo = ZERO - w2
    t1hi = w2 - _b2u(w2 != ZERO)
    # t2 = t0 + t1; on carry add EPSILON once more (never re-carries)
    t2lo, t2hi, c = add64(t0lo2, t0hi2, t1lo, t1hi)
    e2 = c * EPS32
    t2lo2 = t2lo + e2
    t2hi2 = t2hi + _b2u(t2lo2 < t2lo)
    return canonicalize(t2lo2, t2hi2)


def gl_mul_pow2(lo, hi, e):
    """x * 2^e mod p on limb planes; e is a u32 exponent plane in [0, 192).

    2 generates the order-192 cyclic subgroup (2^96 ≡ -1, 2^192 ≡ 1 mod p),
    and every 64th root of unity is a power of 8 — so ALL twiddles of NTT
    stages s <= 6 are powers of two and their multiplies collapse to this:
    a variable 64->160-bit left shift (no 32x32 products) + reduction.
    2^128 ≡ -2^32 mod p handles the fifth limb.
    """
    neg = e >= np.uint32(96)
    e2 = jnp.where(neg, e - np.uint32(96), e)
    q = e2 >> np.uint32(5)  # word shift, 0..2
    r = e2 & np.uint32(31)  # bit shift
    inv31 = np.uint32(31) - r
    # (x << r) as three 32-bit words; lo >> (32-r) via (>> (31-r)) >> 1 so
    # r = 0 stays well-defined
    w0 = lo << r
    w1 = (hi << r) | ((lo >> inv31) >> ONE)
    w2 = (hi >> inv31) >> ONE
    q0 = q == ZERO
    q1 = q == ONE
    Z = jnp.zeros_like(w0)
    W0 = jnp.where(q0, w0, Z)
    W1 = jnp.where(q0, w1, jnp.where(q1, w0, Z))
    W2 = jnp.where(q0, w2, jnp.where(q1, w1, w0))
    W3 = jnp.where(q0, Z, jnp.where(q1, w2, w1))
    W4 = jnp.where(q0 | q1, Z, w2)
    rlo, rhi = reduce128(W0, W1, W2, W3)
    rlo, rhi = gl_sub(rlo, rhi, Z, W4)  # W4·2^128 ≡ -(0, W4)
    nlo, nhi = gl_sub(Z, Z, rlo, rhi)  # e >= 96: negate (2^96 ≡ -1)
    return jnp.where(neg, nlo, rlo), jnp.where(neg, nhi, rhi)


def gl_mul_g4(lo, hi):
    """x * 2^48 mod p on limb planes (canonical in/out).

    2^48 is the canonical primitive 4th root of unity (2^96 ≡ -1 mod p), so
    this is the cheap "multiply by i" of radix-4 butterflies: pure shifts
    into 128-bit limbs + reduce128 — no 32x32 multiplies. Its inverse is
    -2^48, i.e. i^{-1}·x = 2^48·(-x), which callers get for free by swapping
    a surrounding subtraction's operands."""
    w1 = lo << _16
    w2 = (lo >> _16) | (hi << _16)
    w3 = hi >> _16
    return reduce128(ZERO, w1, w2, w3)


def split_planes(x):
    """u64 array -> (lo, hi) u32 planes."""
    mask = np.uint64(0xFFFFFFFF)
    return (x & mask).astype(U32), (x >> np.uint64(32)).astype(U32)


def join_planes(lo, hi):
    """(lo, hi) u32 planes -> u64 array."""
    return lo.astype(jnp.uint64) | (hi.astype(jnp.uint64) << np.uint64(32))
