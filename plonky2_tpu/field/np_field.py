"""Vectorized Goldilocks arithmetic on host numpy u64 arrays.

The witness generator's batch engine runs on host (its dependency graph is
data-dependent scheduling, not device math; see iop/generator.py) — these are
the numpy duals of field/goldilocks.py's jnp ops (identical limb algebra;
numpy unsigned arithmetic wraps mod 2^64 exactly like XLA's u64).
Reference: field/src/goldilocks_field.rs:245-429.
"""

from __future__ import annotations

import numpy as np

P = np.uint64(0xFFFFFFFF00000001)
EPSILON = np.uint64(0xFFFFFFFF)  # 2^32 - 1 = 2^64 mod p
MASK32 = np.uint64(0xFFFFFFFF)
_32 = np.uint64(32)


def canonicalize(x: np.ndarray) -> np.ndarray:
    return np.where(x >= P, x - P, x)


def add(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    s = x + y
    s = np.where(s < x, s + EPSILON, s)
    return canonicalize(s)


def sub(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    d = x - y
    return np.where(x < y, d - EPSILON, d)


def neg(x: np.ndarray) -> np.ndarray:
    return np.where(x == 0, x, P - x)


def reduce128(lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    hi_hi = hi >> _32
    hi_lo = hi & MASK32
    t0 = lo - hi_hi
    t0 = np.where(lo < hi_hi, t0 - EPSILON, t0)
    t1 = hi_lo * EPSILON
    t2 = t0 + t1
    t2 = np.where(t2 < t1, t2 + EPSILON, t2)
    return canonicalize(t2)


def mul(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    xl = x & MASK32
    xh = x >> _32
    yl = y & MASK32
    yh = y >> _32
    ll = xl * yl
    lh = xl * yh
    hl = xh * yl
    hh = xh * yh
    mid = (ll >> _32) + (lh & MASK32) + (hl & MASK32)
    lo = (ll & MASK32) | ((mid & MASK32) << _32)
    hi = hh + (lh >> _32) + (hl >> _32) + (mid >> _32)
    return reduce128(lo, hi)


def mul_scalar(x: np.ndarray, c: int) -> np.ndarray:
    return mul(x, np.uint64(c))


def ext2_mul(a0, a1, b0, b1, w: int = 7):
    """(a0 + a1 X)(b0 + b1 X) mod (X^2 - w)."""
    t = mul(a0, b0)
    u = mul(a1, b1)
    c0 = add(t, mul_scalar(u, w))
    c1 = add(mul(a0, b1), mul(a1, b0))
    return c0, c1


def ext2_add(a0, a1, b0, b1):
    return add(a0, b0), add(a1, b1)


# ---------------------------------------------------------------------------
# Native C++ dispatch: single-pass u128 kernels replace the multi-pass numpy
# limb algebra for real arrays (scalar/0-d inputs keep the numpy path so
# return types are unchanged). plonky2_tpu/native is bit-exact by test.
# ---------------------------------------------------------------------------

def _install_native():
    try:
        from plonky2_tpu import native
    except Exception:
        return
    if not native.available:
        return

    g = globals()
    np_add, np_sub, np_mul, np_neg, np_mul_scalar = add, sub, mul, neg, mul_scalar

    def _arr(x):
        return isinstance(x, np.ndarray) and x.ndim >= 1

    g["add"] = lambda x, y: native.add(x, y) if _arr(x) or _arr(y) else np_add(x, y)
    g["sub"] = lambda x, y: native.sub(x, y) if _arr(x) or _arr(y) else np_sub(x, y)
    g["mul"] = lambda x, y: native.mul(x, y) if _arr(x) or _arr(y) else np_mul(x, y)
    g["neg"] = lambda x: native.neg(x) if _arr(x) else np_neg(x)
    g["mul_scalar"] = (
        lambda x, c: native.mul_scalar(x, c) if _arr(x) else np_mul_scalar(x, c)
    )
    g["add_np"], g["sub_np"], g["mul_np"], g["neg_np"] = np_add, np_sub, np_mul, np_neg


_install_native()
