"""STARK Fiat-Shamir transcript replay (reference starky/src/get_challenges.rs)."""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.verifier import fri_challenges
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.starky.proof import StarkProofChallenges, StarkProofWithPublicInputs
from plonky2_tpu.starky.vanishing import compute_eval_vanishing_poly, get_dummy_polys


def get_challenges(stark, proof_with_pis: StarkProofWithPublicInputs, config,
                   verifier_circuit_fri_params=None,
                   challenger: Challenger | None = None,
                   observe_instance: bool = True,
                   hasher=None,
                   ctl_challenge_set=None,
                   ctl_zs_data=None,
                   num_ctl_helpers_per_z=None) -> StarkProofChallenges:
    proof = proof_with_pis.proof
    public_inputs = proof_with_pis.public_inputs
    degree_bits = proof.recover_degree_bits(config)
    num_challenges = config.num_challenges

    challenger = challenger or Challenger(hasher)
    if observe_instance:
        challenger.observe_elements(public_inputs)
        config.observe(challenger)
        challenger.observe_cap(proof.trace_cap)

    lookup_challenge_set = ctl_challenge_set
    lookup_challenges = None
    if stark.uses_lookups():
        if lookup_challenge_set is None:
            from plonky2_tpu.starky.lookup import get_grand_product_challenge_set

            lookup_challenge_set = get_grand_product_challenge_set(challenger, num_challenges)
        lookup_challenges = [ch.beta for ch in lookup_challenge_set.challenges]
    if proof.auxiliary_polys_cap is not None:
        challenger.observe_cap(proof.auxiliary_polys_cap)

    stark_alphas_prime = challenger.get_n_challenges(num_challenges)

    pow_degree = max(2, stark.constraint_degree() + 1)
    num_aux = len(proof.openings.auxiliary_polys or [])
    poly_evals = get_dummy_polys(challenger, stark.COLUMNS, num_aux, pow_degree)
    zeta_prime = challenger.get_extension_challenge(2)
    dummy_ctl_vars = None
    if ctl_zs_data is not None:
        from plonky2_tpu.starky.cross_table_lookup import CtlCheckVars

        dummy_ctl_vars = CtlCheckVars.from_proof(
            ctl_zs_data, poly_evals.auxiliary_polys, poly_evals.auxiliary_polys_next,
            stark.num_lookup_helper_columns(config), num_ctl_helpers_per_z,
        )
    constraint_evals = compute_eval_vanishing_poly(
        stark, poly_evals, public_inputs, stark_alphas_prime, zeta_prime, degree_bits,
        lookup_challenges=lookup_challenges,
        num_lookup_columns=stark.num_lookup_helper_columns(config),
        ctl_vars=dummy_ctl_vars,
    )
    challenger.observe_extension_elements(constraint_evals)

    stark_alphas = challenger.get_n_challenges(num_challenges)

    if proof.quotient_polys_cap is not None:
        challenger.observe_cap(proof.quotient_polys_cap)
    stark_zeta = challenger.get_extension_challenge(2)

    for batch in proof.openings.to_fri_openings().batches:
        challenger.observe_extension_elements(batch.values)

    final_poly_coeff_len = max_num_query_steps = None
    if verifier_circuit_fri_params is not None:
        final_poly_coeff_len = verifier_circuit_fri_params.final_poly_len()
        max_num_query_steps = len(verifier_circuit_fri_params.reduction_arity_bits)

    return StarkProofChallenges(
        lookup_challenge_set=lookup_challenge_set,
        stark_alphas=stark_alphas,
        stark_zeta=stark_zeta,
        fri_challenges=fri_challenges(
            challenger,
            proof.opening_proof.commit_phase_merkle_caps,
            proof.opening_proof.final_poly,
            proof.opening_proof.pow_witness,
            degree_bits,
            config.fri_config,
            final_poly_coeff_len=final_poly_coeff_len,
            max_num_query_steps=max_num_query_steps,
        ),
    )
