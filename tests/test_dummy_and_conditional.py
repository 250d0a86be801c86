"""Dummy circuits + conditional recursion basics
(reference recursion/dummy_circuit.rs, conditional_recursive_verifier.rs).
The full cyclic IVC chain lives in tests/validation_cyclic.py (slow)."""

from plonky2_tpu.recursion.dummy_circuit import dummy_circuit, dummy_proof


def test_dummy_circuit_matches_common(inner_common=None):
    from tests.test_plonk_e2e import build_factorial

    data, pw = build_factorial()
    circuit = dummy_circuit(data.common)
    assert circuit.common == data.common
    proof = dummy_proof(circuit, {0: 42})
    assert proof.public_inputs[0] == 42
    circuit.verify(proof)
