"""Conditional recursive verification: select between two proofs with a
boolean then verify the selected one
(reference recursion/conditional_recursive_verifier.rs)."""

from __future__ import annotations

from plonky2_tpu.fri.recursive_verifier import (
    FriInitialTreeProofTarget,
    FriProofTarget,
    FriQueryRoundTarget,
    FriQueryStepTarget,
    MerkleProofTarget,
)
from plonky2_tpu.iop.target import ExtensionTarget
from plonky2_tpu.recursion.recursive_verifier import (
    OpeningSetTarget,
    ProofTarget,
    ProofWithPublicInputsTarget,
    VerifierCircuitTarget,
    verify_proof,
)


def _select_vec(builder, b, v0, v1):
    return [builder.select(b, t0, t1) for t0, t1 in zip(v0, v1)]


def _select_hash(builder, b, h0, h1):
    return _select_vec(builder, b, h0, h1)


def _select_cap(builder, b, cap0, cap1):
    assert len(cap0) == len(cap1)
    return [_select_hash(builder, b, h0, h1) for h0, h1 in zip(cap0, cap1)]


def _select_ext(builder, b, e0, e1):
    return ExtensionTarget(tuple(
        builder.select(b, t0, t1) for t0, t1 in zip(e0.parts, e1.parts)
    ))


def _select_vec_ext(builder, b, v0, v1):
    return [_select_ext(builder, b, e0, e1) for e0, e1 in zip(v0, v1)]


def _select_opening_set(builder, b, os0, os1):
    return OpeningSetTarget(
        constants=_select_vec_ext(builder, b, os0.constants, os1.constants),
        plonk_sigmas=_select_vec_ext(builder, b, os0.plonk_sigmas, os1.plonk_sigmas),
        wires=_select_vec_ext(builder, b, os0.wires, os1.wires),
        plonk_zs=_select_vec_ext(builder, b, os0.plonk_zs, os1.plonk_zs),
        plonk_zs_next=_select_vec_ext(builder, b, os0.plonk_zs_next, os1.plonk_zs_next),
        lookup_zs=_select_vec_ext(builder, b, os0.lookup_zs, os1.lookup_zs),
        next_lookup_zs=_select_vec_ext(builder, b, os0.next_lookup_zs, os1.next_lookup_zs),
        partial_products=_select_vec_ext(builder, b, os0.partial_products, os1.partial_products),
        quotient_polys=_select_vec_ext(builder, b, os0.quotient_polys, os1.quotient_polys),
    )


def _select_merkle_proof(builder, b, p0, p1):
    return MerkleProofTarget(siblings=_select_cap(builder, b, p0.siblings, p1.siblings))


def _select_opening_proof(builder, b, p0: FriProofTarget, p1: FriProofTarget):
    rounds = []
    for r0, r1 in zip(p0.query_round_proofs, p1.query_round_proofs):
        evals_proofs = [
            (_select_vec(builder, b, e0, e1), _select_merkle_proof(builder, b, m0, m1))
            for (e0, m0), (e1, m1) in zip(
                r0.initial_trees_proof.evals_proofs, r1.initial_trees_proof.evals_proofs
            )
        ]
        steps = [
            FriQueryStepTarget(
                evals=_select_vec_ext(builder, b, s0.evals, s1.evals),
                merkle_proof=_select_merkle_proof(builder, b, s0.merkle_proof, s1.merkle_proof),
            )
            for s0, s1 in zip(r0.steps, r1.steps)
        ]
        rounds.append(FriQueryRoundTarget(
            initial_trees_proof=FriInitialTreeProofTarget(evals_proofs=evals_proofs),
            steps=steps,
        ))
    return FriProofTarget(
        commit_phase_merkle_caps=[
            _select_cap(builder, b, c0, c1)
            for c0, c1 in zip(p0.commit_phase_merkle_caps, p1.commit_phase_merkle_caps)
        ],
        query_round_proofs=rounds,
        final_poly=_select_vec_ext(builder, b, p0.final_poly, p1.final_poly),
        pow_witness=builder.select(b, p0.pow_witness, p1.pow_witness),
    )


def select_proof_with_pis(builder, b, pwp0: ProofWithPublicInputsTarget,
                          pwp1: ProofWithPublicInputsTarget) -> ProofWithPublicInputsTarget:
    """if b { pwp0 } else { pwp1 } (reference :68-121)."""
    return ProofWithPublicInputsTarget(
        proof=ProofTarget(
            wires_cap=_select_cap(builder, b, pwp0.proof.wires_cap, pwp1.proof.wires_cap),
            plonk_zs_partial_products_cap=_select_cap(
                builder, b, pwp0.proof.plonk_zs_partial_products_cap,
                pwp1.proof.plonk_zs_partial_products_cap),
            quotient_polys_cap=_select_cap(
                builder, b, pwp0.proof.quotient_polys_cap, pwp1.proof.quotient_polys_cap),
            openings=_select_opening_set(builder, b, pwp0.proof.openings, pwp1.proof.openings),
            opening_proof=_select_opening_proof(
                builder, b, pwp0.proof.opening_proof, pwp1.proof.opening_proof),
        ),
        public_inputs=_select_vec(builder, b, pwp0.public_inputs, pwp1.public_inputs),
    )


def select_verifier_data(builder, b, vd0: VerifierCircuitTarget,
                         vd1: VerifierCircuitTarget) -> VerifierCircuitTarget:
    return VerifierCircuitTarget(
        constants_sigmas_cap=_select_cap(
            builder, b, vd0.constants_sigmas_cap, vd1.constants_sigmas_cap),
        circuit_digest=_select_hash(builder, b, vd0.circuit_digest, vd1.circuit_digest),
    )


def conditionally_verify_proof(builder, condition, pwp0, vd0, pwp1, vd1,
                               inner_common) -> None:
    """Verify pwp0/vd0 when condition else pwp1/vd1 (reference :24-41)."""
    selected_proof = select_proof_with_pis(builder, condition, pwp0, pwp1)
    selected_vd = select_verifier_data(builder, condition, vd0, vd1)
    verify_proof(builder, selected_proof, selected_vd, inner_common)


def conditionally_verify_proof_or_dummy(builder, condition, proof_with_pis,
                                        inner_verifier_data, inner_common) -> None:
    """reference :44-64."""
    from plonky2_tpu.recursion.dummy_circuit import dummy_proof_and_vk

    dummy_pt, dummy_vdt = dummy_proof_and_vk(builder, inner_common)
    conditionally_verify_proof(
        builder, condition, proof_with_pis, inner_verifier_data, dummy_pt, dummy_vdt,
        inner_common,
    )
