"""Native PLONK verifier (host, scalar extension field) —
reference plonk/verifier.rs:17-118.

Verification is latency-bound, tiny, and strictly sequential (transcript
replay), so it runs on host with exact Python-int field math. It is the
acceptance oracle for the TPU prover.
"""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.verifier import verify_fri_proof
from plonky2_tpu.gates.ops import EvaluationVars, HostExtOps
from plonky2_tpu.plonk.get_challenges import get_challenges
from plonky2_tpu.plonk.proof import ProofWithPublicInputs
from plonky2_tpu.plonk.vanishing_poly import (
    NUM_COINS_LOOKUP,
    eval_lut_poly,
    eval_vanishing_poly,
)


def validate_proof_with_pis_shape(proof_with_pis: ProofWithPublicInputs, common) -> None:
    """Reference plonk/validate_shape.rs."""
    proof = proof_with_pis.proof
    config = common.config
    if len(proof_with_pis.public_inputs) != common.num_public_inputs:
        raise ValueError("Wrong number of public inputs")
    cap_len = 1 << config.fri_config.cap_height
    for cap in (proof.wires_cap, proof.plonk_zs_partial_products_cap,
                proof.quotient_polys_cap):
        if len(cap) != cap_len:
            raise ValueError("Wrong Merkle cap length")
    o = proof.openings
    checks = [
        (o.constants, common.num_constants),
        (o.plonk_sigmas, config.num_routed_wires),
        (o.wires, config.num_wires),
        (o.plonk_zs, config.num_challenges),
        (o.plonk_zs_next, config.num_challenges),
        (o.partial_products, config.num_challenges * common.num_partial_products),
        (o.quotient_polys, common.num_quotient_polys()),
        (o.lookup_zs, common.num_all_lookup_polys()),
        (o.lookup_zs_next, common.num_all_lookup_polys()),
    ]
    for vals, expected in checks:
        if len(vals) != expected:
            raise ValueError(
                f"Opening-set shape mismatch: got {len(vals)}, want {expected}"
            )


def verify(proof_with_pis: ProofWithPublicInputs, verifier_data, common) -> None:
    validate_proof_with_pis_shape(proof_with_pis, common)
    gc = common.generic_config()
    public_inputs_hash = gc.inner_hasher.hash_no_pad(proof_with_pis.public_inputs)
    challenges = get_challenges(
        proof_with_pis, public_inputs_hash, verifier_data.circuit_digest, common
    )
    verify_with_challenges(
        proof_with_pis.proof, public_inputs_hash, challenges, verifier_data, common
    )


def verify_with_challenges(proof, public_inputs_hash, challenges, verifier_data,
                           common) -> None:
    ops = HostExtOps()
    openings = proof.openings
    zeta = challenges.plonk_zeta
    degree = common.degree

    lift = lambda c: fs.ext_from_base(c, 2)
    vars = EvaluationVars(
        openings.constants, openings.wires, [lift(h) for h in public_inputs_hash]
    )

    # L_0(zeta) = (zeta^n - 1) / (n * (zeta - 1))
    zeta_pow_deg = fs.ext_exp(zeta, degree)
    z_h_zeta = fs.ext_sub(zeta_pow_deg, fs.ext_one(2))
    l_0_zeta = fs.ext_div(
        z_h_zeta,
        fs.ext_scalar_mul(degree % fs.P, fs.ext_sub(zeta, fs.ext_one(2))),
    )

    has_lookup = common.num_lookup_polys != 0
    if has_lookup:
        nc = common.config.num_challenges
        lut_re_evals = [
            [lift(eval_lut_poly(
                common, l,
                challenges.plonk_deltas[c * NUM_COINS_LOOKUP:(c + 1) * NUM_COINS_LOOKUP]))
             for l in range(len(common.luts))]
            for c in range(nc)
        ]
        lookup_kwargs = dict(
            local_lookup_zs=openings.lookup_zs,
            next_lookup_zs=openings.lookup_zs_next,
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

    # vanishing(zeta) == Z_H(zeta) * reduce_with_powers(t_chunks, zeta^n)
    qdf = common.quotient_degree_factor
    for i in range(common.config.num_challenges):
        chunk = openings.quotient_polys[i * qdf:(i + 1) * qdf]
        t_zeta = fs.ext_zero(2)
        for c in reversed(chunk):
            t_zeta = fs.ext_add(fs.ext_mul(t_zeta, zeta_pow_deg), c)
        if vanishing_polys_zeta[i] != fs.ext_mul(z_h_zeta, t_zeta):
            raise ValueError(f"Quotient identity check failed for challenge {i}")

    merkle_caps = [
        verifier_data.constants_sigmas_cap,
        proof.wires_cap,
        proof.plonk_zs_partial_products_cap,
        proof.quotient_polys_cap,
    ]
    verify_fri_proof(
        common.get_fri_instance(zeta),
        openings.to_fri_openings(),
        challenges.fri_challenges,
        merkle_caps,
        proof.opening_proof,
        common.fri_params,
        hasher=common.generic_config().hasher,
    )
