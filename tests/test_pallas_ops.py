"""u32 limb-plane field algebra + fused Pallas NTT kernel (interpret mode).

The kernel must be bit-identical to the XLA butterfly path — its output feeds
Merkle commitments.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import ntt
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.ops import goldilocks_limbs as gl
from plonky2_tpu.ops.pallas_ntt import butterflies0_pallas


def _rand_canonical(rng, shape):
    return rng.integers(0, fs.P, size=shape, dtype=np.uint64)


def test_limb_algebra_matches_device_field():
    rng = np.random.default_rng(7)
    a = _rand_canonical(rng, (512,))
    b = _rand_canonical(rng, (512,))
    # include boundary values
    edge = np.array([0, 1, fs.P - 1, fs.EPSILON, fs.EPSILON + 1,
                     (1 << 32), fs.P - (1 << 32)], dtype=np.uint64)
    a = np.concatenate([a, edge])
    b = np.concatenate([b, edge[::-1]])
    alo, ahi = gl.split_planes(jnp.asarray(a))
    blo, bhi = gl.split_planes(jnp.asarray(b))

    got = np.asarray(gl.join_planes(*gl.gl_add(alo, ahi, blo, bhi)))
    np.testing.assert_array_equal(got, np.asarray(g.add(jnp.asarray(a), jnp.asarray(b))))
    got = np.asarray(gl.join_planes(*gl.gl_sub(alo, ahi, blo, bhi)))
    np.testing.assert_array_equal(got, np.asarray(g.sub(jnp.asarray(a), jnp.asarray(b))))
    got = np.asarray(gl.join_planes(*gl.gl_mul(alo, ahi, blo, bhi)))
    np.testing.assert_array_equal(got, np.asarray(g.mul(jnp.asarray(a), jnp.asarray(b))))


def test_limb_mul_vs_scalar_exact():
    rng = np.random.default_rng(3)
    a = _rand_canonical(rng, (64,))
    b = _rand_canonical(rng, (64,))
    alo, ahi = gl.split_planes(jnp.asarray(a))
    blo, bhi = gl.split_planes(jnp.asarray(b))
    got = np.asarray(gl.join_planes(*gl.gl_mul(alo, ahi, blo, bhi)))
    want = [(int(x) * int(y)) % fs.P for x, y in zip(a, b)]
    assert got.tolist() == want


@pytest.mark.parametrize("lg_m,V", [(9, 512), (10, 1024), (10, 1000), (11, 512)])
def test_butterflies_kernel_matches_xla(lg_m, V):
    rng = np.random.default_rng(lg_m * 1000 + V)
    m = 1 << lg_m
    v = jnp.asarray(_rand_canonical(rng, (m, V)))
    want = np.asarray(ntt._butterflies0(v, lg_m))
    got = np.asarray(butterflies0_pallas(v, lg_m, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fft_with_pallas_interpret(monkeypatch):
    """Force the integrated ntt path through the kernel (interpret mode)."""
    from plonky2_tpu.ops import pallas_ntt

    monkeypatch.setattr(pallas_ntt, "_FLAG", "1")
    monkeypatch.setattr(pallas_ntt, "_INTERPRET", True, raising=False)
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(_rand_canonical(rng, (2, 1 << 10)))
    got = np.asarray(ntt.fft(coeffs))
    monkeypatch.setattr(pallas_ntt, "_FLAG", "0")
    want = np.asarray(ntt.fft(coeffs))
    np.testing.assert_array_equal(got, want)


def test_fourstep_pallas_matches_xla():
    """DIF+twiddle-epilogue / DIT four-step (interpret) vs the XLA four-step."""
    from plonky2_tpu.ops.pallas_ntt import fft_four_step_pallas, fourstep_supported

    rng = np.random.default_rng(42)
    lg_n = 20
    assert fourstep_supported(lg_n, 1)
    coeffs = jnp.asarray(_rand_canonical(rng, (1, 1 << lg_n)))
    want = np.asarray(ntt._fft_four_step(coeffs))
    got = np.asarray(fft_four_step_pallas(coeffs, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_lde_interleave_pallas(monkeypatch):
    """Fused LDE epilogue (interleave transpose) vs the XLA path."""
    from plonky2_tpu.ops import pallas_ntt

    rng = np.random.default_rng(5)
    coeffs = jnp.asarray(_rand_canonical(rng, (1, 1 << 20)))
    assert pallas_ntt.fourstep_supported(20, 2)  # the path must be live
    monkeypatch.setattr(pallas_ntt, "_FLAG", "0")
    want = np.asarray(ntt.coset_lde(coeffs, 1))
    monkeypatch.setattr(pallas_ntt, "_FLAG", "1")
    monkeypatch.setattr(pallas_ntt, "_INTERPRET", True)
    got = np.asarray(ntt.coset_lde(coeffs, 1))
    np.testing.assert_array_equal(got, want)
