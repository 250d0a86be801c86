"""In-circuit verification of a plonky2 proof
(reference recursion/recursive_verifier.rs + plonk/get_challenges.rs target
dual + plonk/proof.rs target containers).

The vanishing polynomial is evaluated in-circuit by instantiating the SAME
ops-generic definition used by the native prover/verifier with CircuitOps —
constraint order matches by construction.
"""

from __future__ import annotations

from dataclasses import dataclass

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.recursive_verifier import (
    FriChallengesTarget,
    add_virtual_cap,
    add_virtual_fri_proof,
    set_cap_target,
    set_fri_proof_target,
    verify_fri_proof,
)
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOpeningBatch,
    FriOpenings,
)
from plonky2_tpu.gadgets.reducing import ReducingFactorTarget
from plonky2_tpu.gates.ops import CircuitOps, EvaluationVars
from plonky2_tpu.iop.target import ExtensionTarget, Target
from plonky2_tpu.plonk.vanishing_poly import eval_vanishing_poly
from plonky2_tpu.recursion.recursive_challenger import RecursiveChallenger

SALT_SIZE = 4


@dataclass
class VerifierCircuitTarget:
    constants_sigmas_cap: list  # list of 4-target digests
    circuit_digest: list  # 4 targets


@dataclass
class OpeningSetTarget:
    constants: list
    plonk_sigmas: list
    wires: list
    plonk_zs: list
    plonk_zs_next: list
    lookup_zs: list
    next_lookup_zs: list
    partial_products: list
    quotient_polys: list

    def to_fri_openings(self) -> FriOpenings:
        zeta_batch = FriOpeningBatch(
            values=(self.constants + self.plonk_sigmas + self.wires + self.plonk_zs
                    + self.partial_products + self.quotient_polys + self.lookup_zs)
        )
        zeta_next_batch = FriOpeningBatch(
            values=self.plonk_zs_next + self.next_lookup_zs
        )
        return FriOpenings(batches=[zeta_batch, zeta_next_batch])


@dataclass
class ProofTarget:
    wires_cap: list
    plonk_zs_partial_products_cap: list
    quotient_polys_cap: list
    openings: OpeningSetTarget
    opening_proof: object


@dataclass
class ProofWithPublicInputsTarget:
    proof: ProofTarget
    public_inputs: list


@dataclass
class ProofChallengesTarget:
    plonk_betas: list
    plonk_gammas: list
    plonk_alphas: list
    plonk_deltas: list
    plonk_zeta: ExtensionTarget
    fri_challenges: FriChallengesTarget


# -- allocation ---------------------------------------------------------------


def add_virtual_proof_with_pis(builder, common) -> ProofWithPublicInputsTarget:
    proof = _add_virtual_proof(builder, common)
    public_inputs = builder.add_virtual_targets(common.num_public_inputs)
    return ProofWithPublicInputsTarget(proof=proof, public_inputs=public_inputs)


def _add_virtual_proof(builder, common) -> ProofTarget:
    config = common.config
    fri_params = common.fri_params
    cap_height = fri_params.config.cap_height
    salt = SALT_SIZE if fri_params.hiding else 0
    num_leaves_per_oracle = [
        common.num_preprocessed_polys(),
        config.num_wires + salt,
        common.num_zs_partial_products_polys() + common.num_all_lookup_polys() + salt,
    ]
    if common.num_quotient_polys() > 0:
        num_leaves_per_oracle.append(common.num_quotient_polys() + salt)
    return ProofTarget(
        wires_cap=add_virtual_cap(builder, cap_height),
        plonk_zs_partial_products_cap=add_virtual_cap(builder, cap_height),
        quotient_polys_cap=add_virtual_cap(builder, cap_height),
        openings=_add_opening_set(builder, common),
        opening_proof=add_virtual_fri_proof(builder, num_leaves_per_oracle, fri_params),
    )


def _add_opening_set(builder, common) -> OpeningSetTarget:
    config = common.config
    nc = config.num_challenges
    num_lookups = common.num_all_lookup_polys()
    return OpeningSetTarget(
        constants=builder.add_virtual_extension_targets(common.num_constants),
        plonk_sigmas=builder.add_virtual_extension_targets(config.num_routed_wires),
        wires=builder.add_virtual_extension_targets(config.num_wires),
        plonk_zs=builder.add_virtual_extension_targets(nc),
        plonk_zs_next=builder.add_virtual_extension_targets(nc),
        lookup_zs=builder.add_virtual_extension_targets(num_lookups),
        next_lookup_zs=builder.add_virtual_extension_targets(num_lookups),
        partial_products=builder.add_virtual_extension_targets(
            nc * common.num_partial_products),
        quotient_polys=builder.add_virtual_extension_targets(common.num_quotient_polys()),
    )


# -- transcript replay in-circuit ---------------------------------------------


def _observe_fri_params(builder, challenger, fri_params) -> None:
    c = lambda v: builder.constant(v)
    cfg = fri_params.config
    challenger.observe_element(c(cfg.rate_bits))
    challenger.observe_element(c(cfg.cap_height))
    challenger.observe_element(c(cfg.proof_of_work_bits))
    challenger.observe_elements([c(v) for v in cfg.reduction_strategy.serialize_felts()])
    challenger.observe_element(c(cfg.num_query_rounds))
    challenger.observe_element(c(1 if fri_params.hiding else 0))
    challenger.observe_element(c(fri_params.degree_bits))
    challenger.observe_elements([c(v) for v in fri_params.reduction_arity_bits])


def get_challenges_target(builder, proof_t: ProofTarget, public_inputs_hash,
                          circuit_digest, common) -> ProofChallengesTarget:
    config = common.config
    nc = config.num_challenges
    has_lookup = common.num_lookup_polys != 0

    challenger = RecursiveChallenger(builder)
    _observe_fri_params(builder, challenger, common.fri_params)
    challenger.observe_hash(circuit_digest)
    challenger.observe_hash(public_inputs_hash)

    challenger.observe_cap(proof_t.wires_cap)
    plonk_betas = challenger.get_n_challenges(nc)
    plonk_gammas = challenger.get_n_challenges(nc)

    if has_lookup:
        num_lookup_challenges = 4 * nc  # NUM_COINS_LOOKUP
        additional = challenger.get_n_challenges(num_lookup_challenges - 2 * nc)
        plonk_deltas = plonk_betas + plonk_gammas + additional
    else:
        plonk_deltas = []

    challenger.observe_cap(proof_t.plonk_zs_partial_products_cap)
    plonk_alphas = challenger.get_n_challenges(nc)

    challenger.observe_cap(proof_t.quotient_polys_cap)
    plonk_zeta = challenger.get_extension_challenge()

    for batch in proof_t.openings.to_fri_openings().batches:
        challenger.observe_extension_elements(batch.values)

    # FRI challenges (reference fri/challenges.rs:101+ target dual)
    fri_alpha = challenger.get_extension_challenge()
    fri_betas = []
    for cap in proof_t.opening_proof.commit_phase_merkle_caps:
        challenger.observe_cap(cap)
        fri_betas.append(challenger.get_extension_challenge())
    challenger.observe_extension_elements(proof_t.opening_proof.final_poly)
    challenger.observe_element(proof_t.opening_proof.pow_witness)
    fri_pow_response = challenger.get_challenge()
    fri_query_indices = challenger.get_n_challenges(config.fri_config.num_query_rounds)

    return ProofChallengesTarget(
        plonk_betas=plonk_betas,
        plonk_gammas=plonk_gammas,
        plonk_alphas=plonk_alphas,
        plonk_deltas=plonk_deltas,
        plonk_zeta=plonk_zeta,
        fri_challenges=FriChallengesTarget(
            fri_alpha=fri_alpha,
            fri_betas=fri_betas,
            fri_pow_response=fri_pow_response,
            fri_query_indices=fri_query_indices,
        ),
    )


def _get_fri_instance_target(builder, common, zeta: ExtensionTarget) -> FriInstanceInfo:
    """common.get_fri_instance with in-circuit points."""
    zeta_batch = FriBatchInfo(point=zeta, polynomials=common.fri_all_polys())
    g = fs.primitive_root_of_unity(common.degree_bits)
    zeta_next = builder.mul_const_extension(g, zeta)
    zeta_next_batch = FriBatchInfo(point=zeta_next,
                                   polynomials=common.fri_next_batch_polys())
    return FriInstanceInfo(oracles=common.fri_oracles(),
                           batches=[zeta_batch, zeta_next_batch])


# -- verification -------------------------------------------------------------


def verify_proof(builder, proof_with_pis: ProofWithPublicInputsTarget,
                 inner_verifier_data: VerifierCircuitTarget, inner_common) -> None:
    assert len(proof_with_pis.public_inputs) == inner_common.num_public_inputs
    public_inputs_hash = builder.hash_n_to_hash_no_pad(
        list(proof_with_pis.public_inputs)
    )
    challenges = get_challenges_target(
        builder, proof_with_pis.proof, public_inputs_hash,
        inner_verifier_data.circuit_digest, inner_common,
    )
    _verify_proof_with_challenges(
        builder, proof_with_pis.proof, public_inputs_hash, challenges,
        inner_verifier_data, inner_common,
    )


def _verify_proof_with_challenges(builder, proof_t: ProofTarget, public_inputs_hash,
                                  challenges: ProofChallengesTarget,
                                  inner_verifier_data, common) -> None:
    one = builder.one_extension()
    ops = CircuitOps(builder)
    openings = proof_t.openings
    zeta = challenges.plonk_zeta

    vars = EvaluationVars(
        openings.constants,
        openings.wires,
        [builder.convert_to_ext(h) for h in public_inputs_hash],
    )

    zeta_pow_deg = builder.exp_power_of_2_extension(zeta, common.degree_bits)
    z_h_zeta = builder.sub_extension(zeta_pow_deg, one)
    # L_0(zeta) = Z_H(zeta) / (n * (zeta - 1))
    denom = builder.mul_const_extension(
        common.degree % fs.P, builder.sub_extension(zeta, one)
    )
    l_0_zeta = builder.div_extension(z_h_zeta, denom)

    lift = builder.convert_to_ext
    if common.num_lookup_polys != 0:
        # in-circuit LUT-binding polynomial evaluations at the sampled
        # deltas (reference vanishing_poly.rs:1045 get_lut_poly_circuit)
        from plonky2_tpu.plonk.vanishing_poly import (
            NUM_COINS_LOOKUP,
            eval_lut_poly_circuit,
        )

        nc = common.config.num_challenges
        lut_re_evals = [
            [lift(eval_lut_poly_circuit(
                builder, common, l,
                challenges.plonk_deltas[c * NUM_COINS_LOOKUP:(c + 1) * NUM_COINS_LOOKUP]))
             for l in range(len(common.luts))]
            for c in range(nc)
        ]
        lookup_kwargs = dict(
            local_lookup_zs=openings.lookup_zs,
            next_lookup_zs=openings.next_lookup_zs,
            deltas=[lift(d) for d in challenges.plonk_deltas],
            lut_re_evals=lut_re_evals,
        )
    else:
        lookup_kwargs = {}
    vanishing_polys_zeta = eval_vanishing_poly(
        ops, common, zeta, vars,
        openings.plonk_zs, openings.plonk_zs_next, openings.partial_products,
        openings.plonk_sigmas,
        [lift(b) for b in challenges.plonk_betas],
        [lift(g) for g in challenges.plonk_gammas],
        [lift(a) for a in challenges.plonk_alphas],
        l_0_zeta,
        **lookup_kwargs,
    )

    # vanishing(zeta) == Z_H(zeta) * t(zeta) per challenge
    qdf = common.quotient_degree_factor
    scale = ReducingFactorTarget(zeta_pow_deg)
    for i in range(common.config.num_challenges):
        chunk = openings.quotient_polys[i * qdf:(i + 1) * qdf]
        recombined = scale.reduce(chunk, builder)
        computed = builder.mul_extension(z_h_zeta, recombined)
        builder.connect_extension(vanishing_polys_zeta[i], computed)

    merkle_caps = [
        inner_verifier_data.constants_sigmas_cap,
        proof_t.wires_cap,
        proof_t.plonk_zs_partial_products_cap,
        proof_t.quotient_polys_cap,
    ]
    fri_instance = _get_fri_instance_target(builder, common, zeta)
    verify_fri_proof(
        builder, fri_instance, openings.to_fri_openings(),
        challenges.fri_challenges, merkle_caps, proof_t.opening_proof,
        common.fri_params,
    )


# -- witness filling (reference iop/witness.rs set_proof_with_pis_target) -----


def set_proof_with_pis_target(pw, proof_t: ProofWithPublicInputsTarget,
                              proof_with_pis) -> None:
    proof = proof_with_pis.proof
    pw.set_targets(proof_t.public_inputs, proof_with_pis.public_inputs)
    set_cap_target(pw, proof_t.proof.wires_cap, proof.wires_cap)
    set_cap_target(pw, proof_t.proof.plonk_zs_partial_products_cap,
                   proof.plonk_zs_partial_products_cap)
    set_cap_target(pw, proof_t.proof.quotient_polys_cap, proof.quotient_polys_cap)

    ot, o = proof_t.proof.openings, proof.openings
    for targets, values in [
        (ot.constants, o.constants), (ot.plonk_sigmas, o.plonk_sigmas),
        (ot.wires, o.wires), (ot.plonk_zs, o.plonk_zs),
        (ot.plonk_zs_next, o.plonk_zs_next),
        (ot.lookup_zs, o.lookup_zs), (ot.next_lookup_zs, o.lookup_zs_next),
        (ot.partial_products, o.partial_products),
        (ot.quotient_polys, o.quotient_polys),
    ]:
        for t, v in zip(targets, values):
            pw.set_extension_target(t, v)

    set_fri_proof_target(pw, proof_t.proof.opening_proof, proof.opening_proof)


def set_verifier_data_target(pw, vdt: VerifierCircuitTarget, verifier_only) -> None:
    set_cap_target(pw, vdt.constants_sigmas_cap, verifier_only.constants_sigmas_cap)
    pw.set_hash_target(vdt.circuit_digest, verifier_only.circuit_digest)


def add_virtual_verifier_data(builder, cap_height: int) -> VerifierCircuitTarget:
    return VerifierCircuitTarget(
        constants_sigmas_cap=add_virtual_cap(builder, cap_height),
        circuit_digest=builder.add_virtual_hash(),
    )
