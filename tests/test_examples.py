"""Prove + verify each reference example (driver configs 1-2)."""

import pytest

from plonky2_tpu.examples import fibonacci, range_check, square_root
from plonky2_tpu.field import scalar as fs


def test_fibonacci():
    data, proof = fibonacci.build_and_prove()
    a, b = 0, 1
    for _ in range(99):
        a, b = b, fs.add(a, b)
    assert proof.public_inputs == [0, 1, b]
    data.verify(proof)


def test_range_check():
    data, proof = range_check.build_and_prove(12345678)
    assert proof.public_inputs == [12345678]
    data.verify(proof)


def test_range_check_out_of_range():
    with pytest.raises(Exception):
        range_check.build_and_prove(1 << 40)


def test_square_root():
    data, proof, x = square_root.build_and_prove()
    assert proof.public_inputs == [fs.mul(x, x)]
    data.verify(proof)
