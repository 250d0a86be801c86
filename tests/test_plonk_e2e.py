"""End-to-end PLONK prove -> verify on the factorial example
(reference examples/factorial.rs — the minimum full-stack slice)."""

import pytest

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def build_factorial(n_terms=100):
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    initial = builder.add_virtual_target()
    cur = initial
    for i in range(2, n_terms + 1):
        cur = builder.mul(cur, builder.constant(i))
    builder.register_public_input(initial)
    builder.register_public_input(cur)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial, 1)
    return data, pw


@pytest.fixture(scope="module")
def factorial_proof():
    data, pw = build_factorial()
    proof = data.prove(pw)
    return data, proof


def test_factorial_prove_verify(factorial_proof):
    data, proof = factorial_proof
    expected = 1
    for i in range(2, 101):
        expected = fs.mul(expected, i)
    assert proof.public_inputs == [1, expected]
    data.verify(proof)


def test_factorial_tampered_public_input_rejected(factorial_proof):
    import copy

    data, proof = factorial_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[1] = fs.add(bad.public_inputs[1], 1)
    with pytest.raises(Exception):
        data.verify(bad)


def test_factorial_tampered_opening_rejected(factorial_proof):
    import copy

    data, proof = factorial_proof
    bad = copy.deepcopy(proof)
    w = bad.proof.openings.wires[0]
    bad.proof.openings.wires[0] = (fs.add(w[0], 1), w[1])
    with pytest.raises(Exception):
        data.verify(bad)


def test_factorial_zk_config():
    """Zero-knowledge config: blinding rows + salted Merkle leaves
    (reference standard_recursion_zk_config)."""
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.iop.witness import PartialWitness

    builder = CircuitBuilder(CircuitConfig.standard_recursion_zk_config())
    initial = builder.add_virtual_target()
    cur = initial
    for i in range(2, 30):
        cur = builder.mul(cur, builder.constant(i))
    builder.register_public_input(initial)
    builder.register_public_input(cur)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial, 1)
    proof = data.prove(pw)
    data.verify(proof)
