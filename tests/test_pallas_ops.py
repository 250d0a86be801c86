"""u32 limb-plane field algebra + fused Pallas NTT kernel (interpret mode).

The kernel must be bit-identical to the XLA butterfly path — its output feeds
Merkle commitments.
"""

import os

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


def test_limb_mul_pow2_exact():
    """x·2^e mod p via variable shifts (the cheap stage<=6 twiddle multiply)
    against exact big-int arithmetic, all exponents 0..191 + edge values."""
    rng = np.random.default_rng(11)
    a = np.concatenate([
        _rand_canonical(rng, (192,)),
        np.array([0, 1, fs.P - 1, fs.EPSILON, fs.EPSILON + 1, 1 << 32],
                 dtype=np.uint64),
    ])
    e = np.concatenate([
        np.arange(192, dtype=np.uint32),
        rng.integers(0, 192, size=6, dtype=np.uint32),
    ])
    alo, ahi = gl.split_planes(jnp.asarray(a))
    got = np.asarray(gl.join_planes(*gl.gl_mul_pow2(alo, ahi, jnp.asarray(e))))
    want = [(int(x) * pow(2, int(k), fs.P)) % fs.P for x, k in zip(a, e)]
    assert got.tolist() == want


def test_stage_twiddles_are_powers_of_two():
    """Stages 1..6 twiddle/cube tables must equal 2^exponent-plane — the
    invariant the cheap kernel path relies on."""
    from plonky2_tpu.ops import pallas_ntt as pn

    for inverse in (False, True):
        we = pn._twiddle_exp_plane(inverse)[:, 0]
        t = np.concatenate([
            g.np_powers(fs.inverse(fs.primitive_root_of_unity(s)) if inverse
                        else fs.primitive_root_of_unity(s), 1 << (s - 1))
            for s in range(1, pn._CHEAP_MAX + 1)
        ])
        assert [pow(2, int(k), fs.P) for k in we] == t.tolist()
        ce = pn._cube_exp_plane(inverse)[:, 0]
        rows = []
        for sl in (1, 3, 5):
            r = fs.primitive_root_of_unity(sl + 1)
            if inverse:
                r = fs.inverse(r)
            rows.append(g.np_powers(fs.exp(r, 3), 1 << (sl - 1)))
        t = np.concatenate(rows)
        assert [pow(2, int(k), fs.P) for k in ce] == t.tolist()


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


def test_poseidon_permute_body_matches_scalar():
    """The pallas sponge kernel's round body (all 30 rounds: RC, sbox, MDS
    on u32 limb planes), run EAGERLY as plain jnp on tiny [12, 1, 8] planes
    — the kernel body is pure array code; SMEM refs index like ndarrays.
    ~3 min: XLA:CPU's compile of the unrolled MDS while_loop bodies is
    superlinear, so this is the single big-compile test we afford in CI.
    Full pallas plumbing (BlockSpecs/grid/pl.ds) is validated on the real
    TPU (/verify) and by the env-gated interpret smoke test below."""
    from plonky2_tpu.hash import poseidon as ps
    from plonky2_tpu.ops import pallas_poseidon as pp

    rng = np.random.default_rng(2)
    states = _rand_canonical(rng, (12, 8))
    lo = jnp.asarray((states & np.uint64(0xFFFFFFFF)).astype(np.uint32)).reshape(12, 1, 8)
    hi = jnp.asarray((states >> np.uint64(32)).astype(np.uint32)).reshape(12, 1, 8)
    olo, ohi = pp._permute_body(jnp.asarray(pp._RC_LO), jnp.asarray(pp._RC_HI), lo, hi)
    got = (np.asarray(olo).astype(np.uint64)
           | (np.asarray(ohi).astype(np.uint64) << np.uint64(32))).reshape(12, -1)
    for i in (0, 3, 7):
        want = ps.permute([int(v) for v in states[:, i]])
        assert [int(v) for v in got[:, i]] == want


@pytest.mark.skipif(not os.environ.get("PLONKY2_TPU_SLOW_TESTS"),
                    reason="interpret-mode sponge costs minutes on XLA:CPU; "
                           "set PLONKY2_TPU_SLOW_TESTS=1 (real-TPU /verify "
                           "covers this path every round)")
@pytest.mark.parametrize("width", [8, 135])
def test_poseidon_sponge_pallas_interpret(width):
    """End-to-end interpret-mode run of the fused sponge kernel against the
    scalar sponge (width 8 = Merkle compression; 135 = leaf sponge incl.
    the width%8 masking)."""
    from plonky2_tpu.hash import poseidon as ps
    from plonky2_tpu.ops.pallas_poseidon import sponge_pallas

    rng = np.random.default_rng(width)
    n = 1000  # exercises in-block padding
    cols = _rand_canonical(rng, (width, n))
    got = np.asarray(sponge_pallas(jnp.asarray(cols), interpret=True))
    assert got.shape == (4, n)
    for i in (0, 1, 513, n - 1):
        want = ps.hash_n_to_m_no_pad([int(v) for v in cols[:, i]], 4)
        assert [int(v) for v in got[:, i]] == want


def test_merkle_natural_layers_xla_vs_legacy():
    """Natural-order leaf/compress device path (XLA, no pallas) equals the
    legacy bit-reversed path re-indexed."""
    from plonky2_tpu.hash import merkle

    rng = np.random.default_rng(11)
    cols = jnp.asarray(_rand_canonical(rng, (9, 64)))
    leaf_nat = np.asarray(merkle.hash_leaf_cols_dev(cols))
    leaf_legacy = np.asarray(merkle.hash_leaves_dev(jnp.swapaxes(cols, 0, 1)))
    np.testing.assert_array_equal(leaf_nat, leaf_legacy.T)
    par_nat = np.asarray(merkle.compress_halves_dev(jnp.asarray(leaf_nat)))
    # natural pair (j, j+m/2) == ref pair (rev-adjacent)
    m = 32
    pairs = np.concatenate([leaf_nat[:, :m], leaf_nat[:, m:]], axis=0).T  # [m, 8]
    par_legacy = np.asarray(merkle.compress_layer_dev(
        jnp.asarray(pairs.reshape(2 * m, 4))))
    np.testing.assert_array_equal(par_nat, par_legacy.T)
