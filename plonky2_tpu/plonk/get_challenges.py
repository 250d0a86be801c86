"""Fiat-Shamir transcript replay for verification
(reference plonk/get_challenges.rs:26-95)."""

from __future__ import annotations

from plonky2_tpu.fri.verifier import fri_challenges
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.plonk.proof import ProofChallenges, ProofWithPublicInputs

NUM_COINS_LOOKUP = 4  # reference circuit_builder.rs NUM_COINS_LOOKUP


def get_challenges(proof_with_pis: ProofWithPublicInputs, public_inputs_hash,
                   circuit_digest, common) -> ProofChallenges:
    proof = proof_with_pis.proof
    config = common.config
    num_challenges = config.num_challenges
    has_lookup = common.num_lookup_polys != 0

    challenger = Challenger(common.generic_config().hasher)
    common.fri_params.observe(challenger)
    challenger.observe_hash(circuit_digest)
    challenger.observe_hash(public_inputs_hash)

    challenger.observe_cap(proof.wires_cap)
    plonk_betas = challenger.get_n_challenges(num_challenges)
    plonk_gammas = challenger.get_n_challenges(num_challenges)

    if has_lookup:
        num_lookup_challenges = NUM_COINS_LOOKUP * num_challenges
        additional = challenger.get_n_challenges(
            num_lookup_challenges - 2 * num_challenges
        )
        plonk_deltas = plonk_betas + plonk_gammas + additional
    else:
        plonk_deltas = []

    challenger.observe_cap(proof.plonk_zs_partial_products_cap)
    plonk_alphas = challenger.get_n_challenges(num_challenges)

    challenger.observe_cap(proof.quotient_polys_cap)
    plonk_zeta = challenger.get_extension_challenge(2)

    for batch in proof.openings.to_fri_openings().batches:
        challenger.observe_extension_elements(batch.values)

    return ProofChallenges(
        plonk_betas=plonk_betas,
        plonk_gammas=plonk_gammas,
        plonk_alphas=plonk_alphas,
        plonk_deltas=plonk_deltas,
        plonk_zeta=plonk_zeta,
        fri_challenges=fri_challenges(
            challenger,
            proof.opening_proof.commit_phase_merkle_caps,
            proof.opening_proof.final_poly,
            proof.opening_proof.pow_witness,
            common.degree_bits,
            config.fri_config,
        ),
    )
