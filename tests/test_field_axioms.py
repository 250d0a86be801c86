"""Systematic field-axiom checks for every shipped field
(reference field/src/field_testing.rs, prime_field_testing.rs)."""

import random

import pytest

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.field.field_testing import (
    FieldOps,
    check_field_axioms,
    check_frobenius,
    check_inverse_2exp,
    prime_field_ops,
)
from plonky2_tpu.field.secp256k1 import Secp256k1Base, Secp256k1Scalar


def test_goldilocks_axioms():
    check_field_axioms(prime_field_ops(fs.P))
    check_inverse_2exp(fs.P, lambda e: fs.inverse(pow(2, e, fs.P)))


@pytest.mark.parametrize("cls", [Secp256k1Base, Secp256k1Scalar])
def test_secp256k1_axioms(cls):
    p = cls.ORDER if hasattr(cls, "ORDER") else cls.P
    rng = random.Random(1)
    samples = [0, 1, p - 1] + [rng.randrange(p) for _ in range(16)]
    ops = FieldOps(
        add=lambda a, b: cls.add(a, b),
        mul=lambda a, b: cls.mul(a, b),
        neg=lambda a: cls.sub(0, a),
        inverse=lambda a: cls.inverse(a),
        zero=0,
        one=1,
        samples=samples,
    )
    check_field_axioms(ops)


@pytest.mark.parametrize("d", [2, 4, 5])
def test_extension_axioms(d):
    rng = random.Random(d)
    edge = [tuple([0] * d), tuple([1] + [0] * (d - 1))]
    samples = edge + [tuple(rng.randrange(fs.P) for _ in range(d))
                      for _ in range(14)]
    ops = FieldOps(
        add=lambda a, b: fs.ext_add(a, b),
        mul=lambda a, b: fs.ext_mul(a, b),
        neg=lambda a: fs.ext_neg(a),
        inverse=lambda a: fs.ext_inverse(a),
        zero=tuple([0] * d),
        one=tuple([1] + [0] * (d - 1)),
        samples=samples,
    )
    check_field_axioms(ops)
    x = tuple(rng.randrange(fs.P) for _ in range(d))
    check_frobenius(d, lambda v: fs.ext_frobenius(v), fs.ext_mul, x)
    # Frobenius is the p-power map
    phi = fs.ext_frobenius(x)
    assert phi == fs.ext_exp(x, fs.P)
