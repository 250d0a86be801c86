"""Cyclic recursion / IVC: a circuit that verifies a proof of ITSELF, with
the verification key carried in the public inputs
(reference recursion/cyclic_recursion.rs)."""

from __future__ import annotations

from plonky2_tpu.recursion.conditional_recursive_verifier import (
    conditionally_verify_proof,
)
from plonky2_tpu.recursion.dummy_circuit import dummy_proof_and_vk
from plonky2_tpu.recursion.recursive_verifier import VerifierCircuitTarget


def verifier_data_from_slice(public_inputs: list, common) -> tuple:
    """(circuit_digest, constants_sigmas_cap) decoded from the tail of the
    public inputs: [..., circuit_digest, constants_sigmas_cap]
    (reference cyclic_recursion.rs:20-45). Works for values or targets."""
    cap_len = 1 << common.config.fri_config.cap_height
    n = len(public_inputs)
    assert n >= 4 + 4 * cap_len, "Not enough public inputs"
    cap = [
        [public_inputs[n - 4 * (cap_len - i) + j] for j in range(4)]
        for i in range(cap_len)
    ]
    digest = [public_inputs[n - 4 - 4 * cap_len + j] for j in range(4)]
    return digest, cap


def add_verifier_data_public_inputs(builder) -> VerifierCircuitTarget:
    """Register the circuit's own VK as public inputs
    (reference circuit_builder.rs:429-444). Call once; register no public
    inputs after this."""
    assert getattr(builder, "verifier_data_public_input", None) is None, (
        "add_verifier_data_public_inputs only needs to be called once"
    )
    from plonky2_tpu.recursion.recursive_verifier import add_virtual_verifier_data

    vd = add_virtual_verifier_data(builder, builder.config.fri_config.cap_height)
    builder.register_public_inputs(vd.circuit_digest)
    for digest in vd.constants_sigmas_cap:
        builder.register_public_inputs(digest)
    builder.verifier_data_public_input = vd
    return vd


def conditionally_verify_cyclic_proof(builder, condition, cyclic_proof_with_pis,
                                      other_proof_with_pis, other_verifier_data,
                                      common_data) -> None:
    """reference cyclic_recursion.rs:103-156."""
    verifier_data = getattr(builder, "verifier_data_public_input", None)
    assert verifier_data is not None, (
        "Must call add_verifier_data_public_inputs before cyclic recursion"
    )
    existing = getattr(builder, "goal_common_data", None)
    if existing is not None:
        assert existing == common_data
    else:
        builder.goal_common_data = common_data

    inner_digest, inner_cap = verifier_data_from_slice(
        cyclic_proof_with_pis.public_inputs, common_data
    )
    # Every proof in the cycle must use the same verifier data.
    for a, b in zip(inner_digest, verifier_data.circuit_digest):
        builder.connect(a, b)
    for h_a, h_b in zip(inner_cap, verifier_data.constants_sigmas_cap):
        for a, b in zip(h_a, h_b):
            builder.connect(a, b)

    conditionally_verify_proof(
        builder, condition, cyclic_proof_with_pis, verifier_data,
        other_proof_with_pis, other_verifier_data, common_data,
    )

    # Make sure we have every gate to match common_data.
    for g in common_data.gates:
        builder.gates.setdefault(g.id(), g)


def conditionally_verify_cyclic_proof_or_dummy(builder, condition,
                                               cyclic_proof_with_pis,
                                               common_data) -> None:
    dummy_pt, dummy_vdt = dummy_proof_and_vk(builder, common_data)
    conditionally_verify_cyclic_proof(
        builder, condition, cyclic_proof_with_pis, dummy_pt, dummy_vdt, common_data
    )


def check_cyclic_proof_verifier_data(proof_with_pis, verifier_only, common) -> None:
    """Native check: VK in the public inputs matches the real VK
    (reference cyclic_recursion.rs:180+)."""
    digest, cap = verifier_data_from_slice(proof_with_pis.public_inputs, common)
    if list(digest) != list(verifier_only.circuit_digest):
        raise ValueError("Cyclic proof: circuit digest mismatch")
    for a, b in zip(cap, verifier_only.constants_sigmas_cap):
        if list(a) != list(b):
            raise ValueError("Cyclic proof: constants/sigmas cap mismatch")
