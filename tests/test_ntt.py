"""NTT tests vs naive O(n^2) evaluation (mirrors reference fft.rs:215-249)."""

import random

import numpy as np
import pytest

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import ntt
from plonky2_tpu.field import scalar as s


def naive_eval(coeffs, x):
    acc = 0
    for c in reversed(coeffs):
        acc = s.add(s.mul(acc, x), c)
    return acc


def naive_dft(coeffs, shift=1):
    n = len(coeffs)
    lg_n = n.bit_length() - 1
    gen = s.primitive_root_of_unity(lg_n)
    pts = []
    x = shift
    for _ in range(n):
        pts.append(naive_eval(coeffs, x))
        x = s.mul(x, gen)
    return pts


@pytest.mark.parametrize("lg_n", [0, 1, 2, 5, 8])
def test_fft_matches_naive(lg_n):
    rng = random.Random(lg_n)
    n = 1 << lg_n
    coeffs = [rng.randrange(s.P) for _ in range(n)]
    out = [int(v) for v in np.asarray(ntt.fft(g.to_field(coeffs)))]
    assert out == naive_dft(coeffs)


def test_fft_batched():
    rng = random.Random(42)
    batch = [[rng.randrange(s.P) for _ in range(32)] for _ in range(7)]
    out = np.asarray(ntt.fft(g.to_field(batch)))
    for row, coeffs in zip(out, batch):
        assert [int(v) for v in row] == naive_dft(coeffs)


@pytest.mark.parametrize("lg_n", [1, 4, 7])
def test_ifft_roundtrip(lg_n):
    rng = random.Random(10 + lg_n)
    coeffs = [rng.randrange(s.P) for _ in range(1 << lg_n)]
    C = g.to_field(coeffs)
    back = [int(v) for v in np.asarray(ntt.ifft(ntt.fft(C)))]
    assert back == coeffs


def test_coset_fft():
    rng = random.Random(77)
    coeffs = [rng.randrange(s.P) for _ in range(64)]
    out = [int(v) for v in np.asarray(ntt.coset_fft(g.to_field(coeffs)))]
    assert out == naive_dft(coeffs, shift=s.MULTIPLICATIVE_GROUP_GENERATOR)
    back = [int(v) for v in np.asarray(ntt.coset_ifft(ntt.coset_fft(g.to_field(coeffs))))]
    assert back == coeffs


@pytest.mark.parametrize("rate_bits", [1, 3])
def test_lde_zero_tail_matches_padded(rate_bits):
    rng = random.Random(88)
    m = 32
    coeffs = [rng.randrange(s.P) for _ in range(m)]
    padded = coeffs + [0] * (m * ((1 << rate_bits) - 1))
    C = g.to_field(coeffs)
    # plain subgroup LDE
    fast = [int(v) for v in np.asarray(ntt.lde_fft(C, rate_bits))]
    ref = [int(v) for v in np.asarray(ntt.fft(g.to_field(padded)))]
    assert fast == ref
    # coset LDE
    fastc = [int(v) for v in np.asarray(ntt.coset_lde(C, rate_bits))]
    refc = [int(v) for v in np.asarray(ntt.coset_fft(g.to_field(padded)))]
    assert fastc == refc
    assert fastc == naive_dft(padded, shift=s.MULTIPLICATIVE_GROUP_GENERATOR)


def test_ifft_four_step_matches_definition():
    """Large-size ifft runs the inverse four-step network (inverted twiddles,
    1/n in the mid table) — must equal the reverse-and-scale definition."""
    import numpy as _np
    import jax.numpy as jnp

    rng = _np.random.default_rng(7)
    n = 1 << 10  # >= _FOUR_STEP_MIN -> four-step path
    a = jnp.asarray(rng.integers(0, s.P, size=(3, n), dtype=_np.uint64))
    got = _np.asarray(ntt.ifft(a))
    f = _np.asarray(ntt.fft(a))
    rev = _np.roll(f[:, ::-1], 1, axis=1)
    n_inv = s.inverse(n % s.P)
    want = _np.asarray(g.mul(jnp.asarray(rev), jnp.asarray(_np.uint64(n_inv))))
    assert (got == want).all()
    assert (_np.asarray(ntt.fft(jnp.asarray(got))) == _np.asarray(a)).all()
