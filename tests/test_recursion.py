"""Recursive proof composition: verify a factorial proof inside a circuit,
prove the outer circuit, verify natively (reference
recursion/recursive_verifier.rs tests / bench_recursion chain)."""

import pytest

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.recursive_verifier import (
    add_virtual_proof_with_pis,
    add_virtual_verifier_data,
    set_proof_with_pis_target,
    set_verifier_data_target,
    verify_proof,
)


@pytest.fixture(scope="module")
def inner():
    from tests.test_plonk_e2e import build_factorial

    data, pw = build_factorial()
    proof = data.prove(pw)
    data.verify(proof)
    return data, proof


def test_recursive_verification(inner):
    inner_data, inner_proof = inner

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_proof_with_pis(builder, inner_data.common)
    inner_vdt = add_virtual_verifier_data(
        builder, inner_data.common.config.fri_config.cap_height
    )
    verify_proof(builder, pt, inner_vdt, inner_data.common)
    builder.register_public_inputs(pt.public_inputs)

    outer_data = builder.build()

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, inner_vdt, inner_data.verifier_only)

    outer_proof = outer_data.prove(pw)
    assert outer_proof.public_inputs == inner_proof.public_inputs
    outer_data.verify(outer_proof)
