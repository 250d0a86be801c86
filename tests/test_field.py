"""Field arithmetic tests: JAX vectorized ops vs pure-Python golden model.

Mirrors the reference's test_field_arithmetic! / test_field_extension! macro
coverage (reference field/src/field_testing.rs:6-204): reduction correctness,
inverses, batch inversion, subgroup generators, extension ops, Frobenius.
"""

import random

import numpy as np
import pytest

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import scalar as s


def _rand(n, seed=0):
    rng = random.Random(seed)
    return [rng.randrange(s.P) for _ in range(n)]


def _np(x):
    return [int(v) for v in np.asarray(x).ravel()]


N = 256


class TestScalarField:
    def test_add_sub_roundtrip(self):
        xs, ys = _rand(N, 1), _rand(N, 2)
        for a, b in zip(xs, ys):
            assert s.sub(s.add(a, b), b) == a

    def test_inverse(self):
        for a in _rand(64, 3):
            assert s.mul(a, s.inverse(a)) == 1

    def test_batch_inverse(self):
        xs = _rand(64, 4)
        assert s.batch_inverse(xs) == [s.inverse(x) for x in xs]

    def test_generator_orders(self):
        # multiplicative generator has order p-1: g^((p-1)/q) != 1 for prime q | p-1
        # p - 1 = 2^32 * 3 * 5 * 17 * 257 * 65537
        for q in [2, 3, 5, 17, 257, 65537]:
            assert pow(s.MULTIPLICATIVE_GROUP_GENERATOR, (s.P - 1) // q, s.P) != 1
        t = s.POWER_OF_TWO_GENERATOR
        assert pow(t, 1 << 32, s.P) == 1
        assert pow(t, 1 << 31, s.P) != 1

    def test_primitive_root_consistency(self):
        # primitive_root_of_unity(k)^2 == primitive_root_of_unity(k-1)
        for k in range(1, 8):
            assert s.square(s.primitive_root_of_unity(k)) == s.primitive_root_of_unity(k - 1)
        assert s.primitive_root_of_unity(0) == 1
        assert s.primitive_root_of_unity(1) == s.P - 1

    def test_coset_shifts_distinct(self):
        shifts = s.get_unique_coset_shifts(16, 8)
        # cosets s_i * <g16> must be pairwise disjoint
        g16 = s.primitive_root_of_unity(4)
        seen = set()
        for sh in shifts:
            x = sh
            for _ in range(16):
                assert x not in seen
                seen.add(x)
                x = s.mul(x, g16)


class TestDeviceField:
    def test_matches_scalar(self):
        xs, ys = _rand(N, 10), _rand(N, 11)
        X, Y = g.to_field(xs), g.to_field(ys)
        assert _np(g.add(X, Y)) == [s.add(a, b) for a, b in zip(xs, ys)]
        assert _np(g.sub(X, Y)) == [s.sub(a, b) for a, b in zip(xs, ys)]
        assert _np(g.mul(X, Y)) == [s.mul(a, b) for a, b in zip(xs, ys)]
        assert _np(g.neg(X)) == [s.neg(a) for a in xs]

    def test_edge_cases(self):
        edge = [0, 1, 2, s.P - 1, s.P - 2, s.EPSILON, s.EPSILON + 1, 1 << 63,
                (1 << 63) - 1, s.P - s.EPSILON, 0xFFFFFFFF00000000]
        E = g.to_field(edge)
        for other in edge:
            O = g.to_field([other] * len(edge))
            assert _np(g.add(E, O)) == [s.add(a, other) for a in edge]
            assert _np(g.sub(E, O)) == [s.sub(a, other) for a in edge]
            assert _np(g.mul(E, O)) == [s.mul(a, other) for a in edge]

    def test_to_field_canonicalizes(self):
        raw = [s.P, s.P + 1, 0xFFFFFFFFFFFFFFFF]
        assert _np(g.to_field(raw)) == [r % s.P for r in raw]

    def test_inverse(self):
        xs = _rand(64, 12)
        X = g.to_field(xs)
        assert _np(g.mul(X, g.inverse(X))) == [1] * 64
        assert _np(g.inverse(g.to_field([0]))) == [0]

    def test_exp(self):
        xs = _rand(32, 13)
        X = g.to_field(xs)
        for e in [0, 1, 2, 7, 12345]:
            assert _np(g.exp_u64(X, e)) == [pow(x, e, s.P) for x in xs]


class TestExtension:
    @pytest.mark.parametrize("d", [2, 4, 5])
    def test_mul_inverse(self, d):
        rng = random.Random(d)
        for _ in range(16):
            a = tuple(rng.randrange(s.P) for _ in range(d))
            assert s.ext_mul(a, s.ext_inverse(a)) == s.ext_one(d)

    @pytest.mark.parametrize("d", [2, 4, 5])
    def test_frobenius_is_pth_power(self, d):
        rng = random.Random(100 + d)
        a = tuple(rng.randrange(s.P) for _ in range(d))
        assert s.ext_frobenius(a) == s.ext_exp(a, s.P)

    @pytest.mark.parametrize("d", [2, 4, 5])
    def test_distributivity(self, d):
        rng = random.Random(200 + d)
        a, b, c = (tuple(rng.randrange(s.P) for _ in range(d)) for _ in range(3))
        lhs = s.ext_mul(a, s.ext_add(b, c))
        rhs = s.ext_add(s.ext_mul(a, b), s.ext_mul(a, c))
        assert lhs == rhs

    def test_device_ext2_matches_scalar(self):
        xs0, xs1, ys0, ys1 = (_rand(N, 20 + i) for i in range(4))
        A = (g.to_field(xs0), g.to_field(xs1))
        B = (g.to_field(ys0), g.to_field(ys1))
        c0, c1 = g.ext2_mul(A, B)
        ref = [s.ext_mul((a0, a1), (b0, b1)) for a0, a1, b0, b1 in zip(xs0, xs1, ys0, ys1)]
        assert _np(c0) == [r[0] for r in ref]
        assert _np(c1) == [r[1] for r in ref]
        i0, i1 = g.ext2_inverse(A)
        refi = [s.ext_inverse((a0, a1)) for a0, a1 in zip(xs0, xs1)]
        assert _np(i0) == [r[0] for r in refi]
        assert _np(i1) == [r[1] for r in refi]
