"""Batched Goldilocks field arithmetic on device (JAX, uint64 lanes).

All functions are elementwise over `jnp.uint64` arrays and keep every value in
canonical form (< p). They are pure and jit-friendly: static shapes, no Python
control flow on traced values. XLA lowers uint64 to 32-bit pairs on TPU; the
hottest paths (NTT butterflies, Poseidon rounds) additionally have fused Pallas
kernels in `plonky2_tpu.ops` built on the same limb algebra.

Capability parity: reference field/src/goldilocks_field.rs (add/sub with
EPSILON overflow correction :245-303, mul via reduce128 :402-415) — re-derived
for 32-bit-limb vector lanes rather than translated.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import scalar

U64 = jnp.uint64

P = np.uint64(scalar.P)
EPSILON = np.uint64(scalar.EPSILON)  # 2^32 - 1 == 2^64 mod p
MASK32 = np.uint64(0xFFFFFFFF)
_32 = np.uint64(32)
ZERO64 = np.uint64(0)


def to_field(x) -> jax.Array:
    """Lift numpy/python ints (arbitrary u64 values) to canonical field elements."""
    arr = jnp.asarray(np.asarray(x, dtype=np.uint64))
    return canonicalize(arr)


def canonicalize(x: jax.Array) -> jax.Array:
    """Map arbitrary u64 bit patterns to canonical residues (one cond-sub).

    Valid for x < 2p (true for every intermediate this module produces) and,
    because p > 2^63, a single conditional subtraction also canonicalizes any
    u64 (x - p < p whenever x >= p).
    """
    return jnp.where(x >= P, x - P, x)


def add(x: jax.Array, y: jax.Array) -> jax.Array:
    """x + y mod p; canonical in, canonical out."""
    s = x + y  # wraps mod 2^64
    over = s < x
    # overflow: s = x+y-2^64, and x+y-p = s + EPSILON (< p, no second overflow)
    s = jnp.where(over, s + EPSILON, s)
    return canonicalize(s)


def sub(x: jax.Array, y: jax.Array) -> jax.Array:
    d = x - y  # wraps mod 2^64
    borrow = x < y
    # borrow: d = x-y+2^64, want x-y+p = d - EPSILON
    return jnp.where(borrow, d - EPSILON, d)


def neg(x: jax.Array) -> jax.Array:
    return jnp.where(x == ZERO64, x, P - x)


def mul(x: jax.Array, y: jax.Array) -> jax.Array:
    """x * y mod p via 32-bit limb products and reduce128."""
    xl = x & MASK32
    xh = x >> _32
    yl = y & MASK32
    yh = y >> _32
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    # 128-bit product = ll + (lh + hl) << 32 + hh << 64, carried into (lo, hi)
    mid = (ll >> _32) + (lh & MASK32) + (hl & MASK32)  # < 3 * 2^32, exact
    lo = (ll & MASK32) | ((mid & MASK32) << _32)
    hi = hh + (lh >> _32) + (hl >> _32) + (mid >> _32)
    return reduce128(lo, hi)


def reduce128(lo: jax.Array, hi: jax.Array) -> jax.Array:
    """Reduce lo + hi*2^64 mod p (hi, lo arbitrary u64), canonical output.

    Uses 2^64 = EPSILON and 2^96 = -1 (mod p): value = lo - hi_hi + hi_lo*EPSILON.
    """
    hi_hi = hi >> _32
    hi_lo = hi & MASK32
    t0 = lo - hi_hi
    borrow = lo < hi_hi
    t0 = jnp.where(borrow, t0 - EPSILON, t0)
    t1 = hi_lo * EPSILON  # < 2^64
    t2 = t0 + t1
    over = t2 < t1
    t2 = jnp.where(over, t2 + EPSILON, t2)
    return canonicalize(t2)


def square(x: jax.Array) -> jax.Array:
    return mul(x, x)


def mul_scalar(x: jax.Array, c: int) -> jax.Array:
    return mul(x, jnp.asarray(np.uint64(c)))


def exp_u64(x: jax.Array, e: int) -> jax.Array:
    """x^e for a static Python-int exponent (square-and-multiply, unrolled)."""
    result = None
    base = x
    while e > 0:
        if e & 1:
            result = base if result is None else mul(result, base)
        e >>= 1
        if e:
            base = square(base)
    if result is None:
        return jnp.full_like(x, np.uint64(1))
    return result


_P_MINUS_2_BITS = np.array(
    [(scalar.P - 2) >> i & 1 for i in range(64)], dtype=np.bool_
)


def inverse(x: jax.Array) -> jax.Array:
    """Batched inverse via x^(p-2), pow ladder rolled into a lax.scan.

    Fully vectorized (no Montgomery-trick serial scan as in the reference,
    field/src/types.rs:133-223). The ladder is a scan rather than 64 unrolled
    squarings because XLA compile time on long unrolled u64 chains is
    superlinear; the loop body is two muls. inverse(0) returns 0 (callers
    that care must check).
    """
    bits = jnp.asarray(_P_MINUS_2_BITS)

    def body(carry, bit):
        result, base = carry
        result = jnp.where(bit, mul(result, base), result)
        return (result, square(base)), None

    (result, _), _ = jax.lax.scan(body, (jnp.ones_like(x), x), bits)
    return result


def inverse_rows(x: jax.Array) -> jax.Array:
    """Batched inverse of [R, n] via the Montgomery trick along axis 0:
    exclusive prefix/suffix product scans + ONE Fermat ladder on [n]
    (reference field/src/types.rs:133-223 batch_multiplicative_inverse).

    The plain `inverse` runs the 64-step pow ladder over the WHOLE matrix
    (~128 full-matrix muls of HBM traffic); this form pays 2 log-depth
    scans + a ladder on one row — ~20x less traffic for R=80 (the round-2
    permutation-argument shape). inverse_rows(0) == 0, matching `inverse`.
    """
    is_zero = x == jnp.uint64(0)
    xs = jnp.where(is_zero, jnp.uint64(1), x)
    prefix = jax.lax.associative_scan(mul, xs, axis=0)       # inclusive
    suffix = jax.lax.associative_scan(mul, xs, axis=0, reverse=True)
    total_inv = inverse(prefix[-1])                          # [n] ladder
    ones = jnp.ones_like(xs[:1])
    pre = jnp.concatenate([ones, prefix[:-1]])               # exclusive
    suf = jnp.concatenate([suffix[1:], ones])
    inv = mul(mul(pre, suf), total_inv[None, :])
    return jnp.where(is_zero, jnp.uint64(0), inv)


def exp_power_of_2(x: jax.Array, k: int) -> jax.Array:
    for _ in range(k):
        x = square(x)
    return x


def powers(z: jax.Array, n: int) -> jax.Array:
    """[1, z, ..., z^(n-1)] for a traced scalar z (associative scan)."""
    if n == 1:
        return jnp.ones((1,), dtype=jnp.uint64)
    rep = jnp.broadcast_to(z, (n - 1,))
    incl = jax.lax.associative_scan(mul, rep)
    return jnp.concatenate([jnp.ones((1,), dtype=jnp.uint64), incl])


def matmul_mod(m: jax.Array, x: jax.Array) -> jax.Array:
    """[r, c] x [c, Q] modular mat-vec batch: few XLA primitives regardless
    of r*c (the tensorized dual of unrolled scalar dot products)."""
    return sum_mod(mul(m[:, :, None], x[None, :, :]), axis=1)


# ---------------------------------------------------------------------------
# Quadratic extension F_p[X]/(X^2 - 7), elementwise over a trailing axis pair
# or over separate (a0, a1) arrays. We use separate arrays: better layout for
# XLA (no gather on the minor-most dim).
# ---------------------------------------------------------------------------

W2 = np.uint64(7)


def ext2_add(a, b):
    return add(a[0], b[0]), add(a[1], b[1])


def ext2_sub(a, b):
    return sub(a[0], b[0]), sub(a[1], b[1])


def ext2_mul(a, b):
    """(a0 + a1 X)(b0 + b1 X) = a0 b0 + 7 a1 b1 + (a0 b1 + a1 b0) X."""
    a0, a1 = a
    b0, b1 = b
    c0 = add(mul(a0, b0), mul_scalar(mul(a1, b1), 7))
    c1 = add(mul(a0, b1), mul(a1, b0))
    return c0, c1


def ext2_scalar_mul(c, a):
    return mul(c, a[0]), mul(c, a[1])


def ext2_square(a):
    return ext2_mul(a, a)


def ext2_neg(a):
    return neg(a[0]), neg(a[1])


def ext2_inverse(a):
    """a^-1 = conj(a) / N(a), N(a) = a0^2 - 7 a1^2."""
    a0, a1 = a
    norm = sub(square(a0), mul_scalar(square(a1), 7))
    ninv = inverse(norm)
    return mul(a0, ninv), mul(neg(a1), ninv)


def sum_mod(x: jax.Array, axis: int = 0) -> jax.Array:
    """Modular sum along an axis via pairwise tree reduction (log depth).

    jnp.sum would wrap mod 2^64; this folds with the field add instead.
    """
    n = x.shape[axis]
    while n > 1:
        half = n // 2
        lo = jax.lax.slice_in_dim(x, 0, half, axis=axis)
        hi = jax.lax.slice_in_dim(x, half, 2 * half, axis=axis)
        s = add(lo, hi)
        if n % 2:
            rest = jax.lax.slice_in_dim(x, 2 * half, n, axis=axis)
            s = jnp.concatenate([add(jax.lax.slice_in_dim(s, 0, 1, axis=axis), rest),
                                 jax.lax.slice_in_dim(s, 1, half, axis=axis)], axis=axis)
        x = s
        n = x.shape[axis]
    return jnp.squeeze(x, axis=axis)


def ext2_sum_mod(a, axis: int = 0):
    return sum_mod(a[0], axis), sum_mod(a[1], axis)


def ext2_powers(z, n: int):
    """[1, z, z^2, ..., z^(n-1)] for an extension scalar z = (z0, z1).

    Log-doubling: p[k+2^s] = p[k] * p[2^s]; log2(n) vectorized ext muls.
    Returns arrays (p0, p1) each of length n.
    """
    def _u64(x):
        return x if isinstance(x, jax.Array) else jnp.asarray(np.uint64(x))

    if isinstance(z, (tuple, list)):
        z0, z1 = _u64(z[0]), _u64(z[1])
    else:
        z0, z1 = _u64(z), jnp.zeros((), dtype=jnp.uint64)
    p0 = jnp.concatenate([jnp.ones((1,), dtype=jnp.uint64), z0[None]])[: max(n, 1)]
    p1 = jnp.concatenate([jnp.zeros((1,), dtype=jnp.uint64), z1[None]])[: max(n, 1)]
    while p0.shape[0] < n:
        top = (p0[-1], p1[-1])
        step = ext2_mul(top, (z0, z1))  # p[len] = p[len-1] * z
        q0, q1 = ext2_mul((p0, p1), (step[0], step[1]))
        p0 = jnp.concatenate([p0, q0])[:n]
        p1 = jnp.concatenate([p1, q1])[:n]
    return p0, p1


# ---------------------------------------------------------------------------
# Host-side constant helpers (numpy, python ints) for building twiddle tables.
# ---------------------------------------------------------------------------

def np_powers(base: int, n: int) -> np.ndarray:
    """[1, base, base^2, ..., base^(n-1)] as numpy uint64 (host)."""
    out = np.empty(n, dtype=np.uint64)
    acc = 1
    for i in range(n):
        out[i] = acc
        acc = (acc * base) % scalar.P
    return out
