"""Native C++ runtime vs the numpy/python reference implementations.

Every native entry point must be bit-exact with its Python dual — the
Python duals are themselves validated against the reference KATs
(tests/test_field.py, tests/test_poseidon.py).
"""

import numpy as np
import pytest

from plonky2_tpu import native
from plonky2_tpu.field import np_field as npf
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.hash import keccak as kk
from plonky2_tpu.hash import poseidon as po

pytestmark = pytest.mark.skipif(not native.available, reason="native lib unavailable")

rng = np.random.default_rng(7)


def _rand(n, canonical=True):
    hi = int(fs.P) if canonical else (1 << 64)
    return rng.integers(0, hi, size=n, dtype=np.uint64)


def test_vector_ops_match_np_field():
    # compare against the pure-numpy implementations (np_field re-exports
    # them as *_np once the native dispatch is installed)
    x, y = _rand(1000), _rand(1000)
    np.testing.assert_array_equal(native.add(x, y), npf.add_np(x, y))
    np.testing.assert_array_equal(native.sub(x, y), npf.sub_np(x, y))
    np.testing.assert_array_equal(native.mul(x, y), npf.mul_np(x, y))
    np.testing.assert_array_equal(native.neg(x), npf.neg_np(x))


def test_mul_noncanonical_inputs():
    # np_field.mul accepts any u64 pair (full 64x64 product then reduce)
    x, y = _rand(500, canonical=False), _rand(500, canonical=False)
    np.testing.assert_array_equal(native.mul(x, y), npf.mul_np(x, y))


def test_edge_values():
    edge = np.array([0, 1, int(fs.P) - 1, int(fs.P) - 2, 0xFFFFFFFF, 1 << 63],
                    dtype=np.uint64) % np.uint64(fs.P)
    for x in edge:
        for y in edge:
            xa, ya = np.array([x]), np.array([y])
            assert native.add(xa, ya)[0] == npf.add_np(xa, ya)[0]
            assert native.sub(xa, ya)[0] == npf.sub_np(xa, ya)[0]
            assert native.mul(xa, ya)[0] == npf.mul_np(xa, ya)[0]


def test_arith_fused():
    c0, c1, a, b, d = (_rand(300) for _ in range(5))
    expect = npf.add_np(npf.mul_np(c0, npf.mul_np(a, b)), npf.mul_np(c1, d))
    np.testing.assert_array_equal(native.arith(c0, c1, a, b, d), expect)


def test_inverse_and_batch_inverse():
    x = _rand(200)
    x[x == 0] = 1
    inv = native.inverse(x)
    np.testing.assert_array_equal(npf.mul_np(x, inv), np.ones_like(x))
    binv = native.batch_inverse(x)
    np.testing.assert_array_equal(binv, inv)
    # zeros pass through as zero
    xz = x.copy()
    xz[::7] = 0
    bz = native.batch_inverse(xz)
    assert (bz[::7] == 0).all()
    nz = xz != 0
    np.testing.assert_array_equal(bz[nz], native.inverse(xz[nz]))


def test_exp():
    x = _rand(50)
    for e in (0, 1, 2, 7, (1 << 32) - 1):
        expect = np.array([pow(int(v), e, int(fs.P)) for v in x], dtype=np.uint64)
        np.testing.assert_array_equal(native.exp_u64(x, e), expect)


def test_poseidon_permute_matches_host():
    states = _rand((17, 12))
    out = native.poseidon_permute(states)
    for k in range(17):
        expect = po.permute_py([int(v) for v in states[k]])
        assert [int(v) for v in out[k]] == expect


def _sponge_py(inputs, num_outputs):
    state = [0] * 12
    for i in range(0, len(inputs), 8):
        chunk = inputs[i : i + 8]
        state[: len(chunk)] = chunk
        state = po.permute_py(state)
    return state[:num_outputs]


def test_poseidon_hash_no_pad():
    inputs = _rand((5, 135))
    out = native.poseidon_hash_no_pad(inputs, 4)
    for k in range(5):
        assert [int(v) for v in out[k]] == _sponge_py([int(v) for v in inputs[k]], 4)


def test_poseidon_gate_witness_matches_run_once():
    from plonky2_tpu.gates.poseidon_gate import PoseidonGate, PoseidonGenerator
    from plonky2_tpu.iop.generator import GeneratedValues
    from plonky2_tpu.iop.target import Wire

    W = 12
    n = 4
    inputs = _rand((n, W))
    swaps = np.array([0, 1, 1, 0], dtype=np.uint64)

    class FakeWitness:
        def __init__(self, row_inputs, swap):
            self.vals = {PoseidonGate.wire_input(i): int(row_inputs[i]) for i in range(W)}
            self.vals[PoseidonGate.WIRE_SWAP] = int(swap)

        def get_target(self, t):
            return self.vals[t.column]

    out = native.poseidon_gate_witness(inputs, swaps)
    for k in range(n):
        gen = PoseidonGenerator(row=0)
        buf = GeneratedValues()
        gen.run_once(FakeWitness(inputs[k], swaps[k]), buf)
        by_col = {t.column: v for t, v in buf.target_values}
        expect = [by_col[t.column] for t in gen.outputs()]
        assert [int(v) for v in out[k]] == expect


def test_keccak_f_matches_numpy():
    states = rng.integers(0, 1 << 64, size=(9, 25), dtype=np.uint64)
    np.testing.assert_array_equal(native.keccak_f(states), kk.keccak_f_np(states))
