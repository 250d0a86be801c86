"""Conditional recursion + a CI-sized cyclic IVC step — the 'hard halves'
that tests/test_dummy_and_conditional.py does not exercise (reference
conditional_recursive_verifier.rs:24-230, cyclic_recursion.rs tests).
The full 3-layer IVC chain remains in tests/validation_cyclic.py."""

import pytest

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.conditional_recursive_verifier import (
    conditionally_verify_proof,
    conditionally_verify_proof_or_dummy,
)
from plonky2_tpu.recursion.recursive_verifier import (
    add_virtual_proof_with_pis,
    add_virtual_verifier_data,
    set_proof_with_pis_target,
    set_verifier_data_target,
    verify_proof,
)


@pytest.fixture(scope="module")
def two_inner_proofs():
    """Two proofs of the same circuit shape with different witnesses."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    cur = x
    for i in range(30):
        cur = b.mul(cur, b.constant(i % 11 + 2))
    b.register_public_input(cur)
    data = b.build()

    proofs = []
    for v in (3, 5):
        pw = PartialWitness()
        pw.set_target(x, v)
        proof = data.prove(pw)
        data.verify(proof)
        proofs.append(proof)
    return data, proofs


def test_conditionally_verify_proof(two_inner_proofs):
    """select-between-two-proofs: build ONE outer circuit, prove it with the
    condition both ways; each proof must verify and expose the selected
    public inputs (reference conditional_recursive_verifier.rs:24-41)."""
    data, (proof_a, proof_b) = two_inner_proofs
    cap_h = data.common.config.fri_config.cap_height

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    cond = b.add_virtual_bool_target_safe()
    pt_a = add_virtual_proof_with_pis(b, data.common)
    vdt_a = add_virtual_verifier_data(b, cap_h)
    pt_b = add_virtual_proof_with_pis(b, data.common)
    vdt_b = add_virtual_verifier_data(b, cap_h)
    conditionally_verify_proof(b, cond, pt_a, vdt_a, pt_b, vdt_b, data.common)
    # expose the selected proof's public input
    sel = b.select(cond, pt_a.public_inputs[0], pt_b.public_inputs[0])
    b.register_public_input(sel)
    outer = b.build()

    for flag, expected in ((True, proof_a.public_inputs[0]),
                           (False, proof_b.public_inputs[0])):
        pw = PartialWitness()
        pw.set_bool_target(cond, flag)
        set_proof_with_pis_target(pw, pt_a, proof_a)
        set_verifier_data_target(pw, vdt_a, data.verifier_only)
        set_proof_with_pis_target(pw, pt_b, proof_b)
        set_verifier_data_target(pw, vdt_b, data.verifier_only)
        outer_proof = outer.prove(pw)
        assert outer_proof.public_inputs == [expected]
        outer.verify(outer_proof)


def test_conditionally_verify_proof_or_dummy(two_inner_proofs):
    """condition=0 routes verification to an auto-generated dummy proof
    (reference conditional_recursive_verifier.rs:44-64)."""
    data, (proof_a, _) = two_inner_proofs
    cap_h = data.common.config.fri_config.cap_height

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    cond = b.add_virtual_bool_target_safe()
    pt = add_virtual_proof_with_pis(b, data.common)
    vdt = add_virtual_verifier_data(b, cap_h)
    conditionally_verify_proof_or_dummy(b, cond, pt, vdt, data.common)
    outer = b.build()

    for flag in (True, False):
        pw = PartialWitness()
        pw.set_bool_target(cond, flag)
        set_proof_with_pis_target(pw, pt, proof_a)
        set_verifier_data_target(pw, vdt, data.verifier_only)
        outer_proof = outer.prove(pw)
        outer.verify(outer_proof)


def test_cyclic_ivc_one_step():
    """A CI-sized cyclic IVC: the circuit verifies ITS OWN verification key
    carried in public inputs — base case (condition=0, dummy) then ONE real
    self-referential step (reference cyclic_recursion.rs test, shrunk from
    the 3-layer chain in tests/validation_cyclic.py)."""
    from plonky2_tpu.gates.simple_gates import NoopGate
    from plonky2_tpu.hash import poseidon as ps
    from plonky2_tpu.recursion.cyclic_recursion import (
        add_verifier_data_public_inputs,
        check_cyclic_proof_verifier_data,
        conditionally_verify_cyclic_proof_or_dummy,
    )
    from plonky2_tpu.recursion.dummy_circuit import cyclic_base_proof

    config = CircuitConfig.standard_recursion_config()

    # fixpoint common data: two recursion levels, padded to 2^12
    builder = CircuitBuilder(config)
    data = builder.build()
    for level in range(2):
        builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
        pt = add_virtual_proof_with_pis(builder, data.common)
        vdt = add_virtual_verifier_data(builder, config.fri_config.cap_height)
        verify_proof(builder, pt, vdt, data.common)
        if level == 1:
            while builder.num_gates() < (1 << 12):
                builder.add_gate(NoopGate(), [])
        data = builder.build()
    common_data = data.common

    builder = CircuitBuilder(config)
    one = builder.one()
    initial_hash = builder.add_virtual_hash()
    builder.register_public_inputs(initial_hash)
    current_hash_in = builder.add_virtual_hash()
    current_hash_out = builder.hash_n_to_hash_no_pad(list(current_hash_in))
    builder.register_public_inputs(current_hash_out)
    counter = builder.add_virtual_public_input()

    verifier_data_target = add_verifier_data_public_inputs(builder)
    common_data.num_public_inputs = builder.num_public_inputs()

    condition = builder.add_virtual_bool_target_safe()
    inner = add_virtual_proof_with_pis(builder, common_data)
    inner_pis = inner.public_inputs
    builder.connect_hashes(initial_hash, inner_pis[0:4])
    actual_hash_in = builder.select_hash(condition, inner_pis[4:8], initial_hash)
    builder.connect_hashes(current_hash_in, actual_hash_in)
    builder.connect(counter, builder.mul_add(condition.target, inner_pis[8], one))

    conditionally_verify_cyclic_proof_or_dummy(builder, condition, inner, common_data)
    data = builder.build()

    initial = [0, 1, 2, 3]

    # base case
    pw = PartialWitness()
    pw.set_bool_target(condition, False)
    set_proof_with_pis_target(
        pw, inner,
        cyclic_base_proof(common_data, data.verifier_only, dict(enumerate(initial))),
    )
    set_verifier_data_target(pw, verifier_data_target, data.verifier_only)
    proof = data.prove(pw)
    check_cyclic_proof_verifier_data(proof, data.verifier_only, data.common)
    data.verify(proof)
    # the base case applies ONE hash to the initial state (counter counts
    # hash applications, reference cyclic_recursion.rs test semantics)
    assert proof.public_inputs[8] == 1
    assert proof.public_inputs[4:8] == ps.hash_no_pad(initial)

    # one real self-referential step
    pw = PartialWitness()
    pw.set_bool_target(condition, True)
    set_proof_with_pis_target(pw, inner, proof)
    set_verifier_data_target(pw, verifier_data_target, data.verifier_only)
    proof = data.prove(pw)
    check_cyclic_proof_verifier_data(proof, data.verifier_only, data.common)
    data.verify(proof)
    assert proof.public_inputs[8] == 2
    assert proof.public_inputs[4:8] == ps.hash_no_pad(ps.hash_no_pad(initial))
