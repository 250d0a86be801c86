"""secp256k1 fields + quartic/quintic Goldilocks extensions
(reference field_testing macros, SURVEY §4 item 1)."""

import pytest

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.field.secp256k1 import Secp256k1Base, Secp256k1Scalar


@pytest.mark.parametrize("F", [Secp256k1Base, Secp256k1Scalar])
def test_secp_field_arithmetic(F):
    import random

    rng = random.Random(0)
    for _ in range(20):
        a, b = rng.randrange(1, F.P), rng.randrange(1, F.P)
        assert F.mul(a, F.inverse(a)) == 1
        assert F.add(a, F.neg(a)) == 0
        assert F.mul(F.add(a, b), a) == F.add(F.mul(a, a), F.mul(b, a))
    # two-adic generator has exact order 2^TWO_ADICITY
    g = F.POWER_OF_TWO_GENERATOR
    assert pow(g, 1 << F.TWO_ADICITY, F.P) == 1
    assert pow(g, 1 << (F.TWO_ADICITY - 1), F.P) != 1
    # sqrt round-trips
    for _ in range(5):
        x = rng.randrange(1, F.P)
        s = F.sqrt(F.square(x))
        assert s in (x, F.neg(x))


@pytest.mark.parametrize("d", [2, 4, 5])
def test_goldilocks_extension_fields(d):
    """Field axioms + Frobenius + order for F_{p^d}
    (reference test_field_extension!)."""
    import random

    rng = random.Random(d)
    rand = lambda: tuple(rng.randrange(fs.P) for _ in range(d))
    one = fs.ext_one(d)
    for _ in range(10):
        a, b, c = rand(), rand(), rand()
        assert fs.ext_mul(a, fs.ext_mul(b, c)) == fs.ext_mul(fs.ext_mul(a, b), c)
        assert fs.ext_mul(a, fs.ext_add(b, c)) == fs.ext_add(
            fs.ext_mul(a, b), fs.ext_mul(a, c)
        )
        if a != fs.ext_zero(d):
            assert fs.ext_mul(a, fs.ext_inverse(a)) == one
        # Frobenius is the p-power map
        assert fs.ext_frobenius(a) == fs.ext_exp(a, fs.P)
        # Frobenius^d = identity
        f = a
        for _ in range(d):
            f = fs.ext_frobenius(f)
        assert f == a
