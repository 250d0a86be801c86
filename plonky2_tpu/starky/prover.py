"""STARK prover (reference starky/src/prover.rs:40-470), TPU-native.

Trace/aux/quotient commitments reuse the PolynomialBatch device pipeline;
the quotient evaluation runs all AIR constraints over the full quotient
coset domain as ONE fused tensorized XLA program (replacing the reference's
32-point packed-SIMD chunking, prover.rs:486-539).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import ntt
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.gates.ops import DeviceBaseOps
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.starky.constraint_consumer import ConstraintConsumer
from plonky2_tpu.starky.evaluation_frame import StarkFrame
from plonky2_tpu.starky.proof import (
    StarkOpeningSet,
    StarkProof,
    StarkProofWithPublicInputs,
)
from plonky2_tpu.starky.vanishing import (
    compute_eval_vanishing_poly,
    eval_vanishing_poly,
    get_dummy_polys,
)
from plonky2_tpu.util import TimingTree, log2_strict


def prove(stark, config, trace_poly_values, public_inputs,
          verifier_circuit_fri_params=None,
          timing: TimingTree | None = None,
          hasher=None) -> StarkProofWithPublicInputs:
    timing = timing or TimingTree("starky prove")
    trace_poly_values = np.asarray(trace_poly_values, dtype=np.uint64)  # [cols, n]
    degree = trace_poly_values.shape[-1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    assert fri_params.total_arities() <= degree_bits + rate_bits - cap_height

    final_poly_coeff_len = max_num_query_steps = None
    if verifier_circuit_fri_params is not None:
        final_poly_coeff_len = verifier_circuit_fri_params.final_poly_len()
        max_num_query_steps = len(verifier_circuit_fri_params.reduction_arity_bits)

    with timing.scope("compute trace commitment"):
        trace_commitment = PolynomialBatch.from_values(
            trace_poly_values, rate_bits, False, cap_height, hasher
        )

    challenger = Challenger(hasher)
    challenger.observe_elements(public_inputs)
    config.observe(challenger)
    challenger.observe_cap(trace_commitment.merkle_tree.cap)

    return prove_with_commitment(
        stark, config, trace_poly_values, trace_commitment, challenger,
        public_inputs, final_poly_coeff_len, max_num_query_steps, timing,
        hasher=hasher,
    )


def prove_with_commitment(stark, config, trace_poly_values, trace_commitment,
                          challenger, public_inputs, final_poly_coeff_len,
                          max_num_query_steps, timing,
                          ctl_data=None, ctl_challenges=None,
                          hasher=None) -> StarkProofWithPublicInputs:
    degree = trace_poly_values.shape[-1]
    degree_bits = log2_strict(degree)
    fri_params = config.fri_params(degree_bits)
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    constraint_degree = stark.constraint_degree()
    assert constraint_degree <= (1 << rate_bits) + 1, (
        "The degree of the Stark constraints must be <= blowup_factor + 1"
    )

    lookup_challenges = None
    auxiliary_polys_commitment = None
    num_auxiliary_polys = 0
    aux_cols = []
    if stark.uses_lookups():
        from plonky2_tpu.starky.lookup import (
            get_grand_product_challenge_set,
            lookup_helper_columns,
        )

        if ctl_challenges is not None:
            lookup_challenges = [ch.beta for ch in ctl_challenges.challenges]
        else:
            challenge_set = get_grand_product_challenge_set(challenger, config.num_challenges)
            lookup_challenges = [ch.beta for ch in challenge_set.challenges]
        for lookup in stark.lookups():
            for challenge in lookup_challenges:
                aux_cols.extend(
                    lookup_helper_columns(lookup, trace_poly_values, challenge,
                                          constraint_degree)
                )
    if ctl_data is not None:
        from plonky2_tpu.starky.cross_table_lookup import get_ctl_auxiliary_polys

        aux_cols.extend(get_ctl_auxiliary_polys(ctl_data))
    if aux_cols:
        aux_np = np.asarray(aux_cols, dtype=np.uint64)
        num_auxiliary_polys = aux_np.shape[0]
        with timing.scope("compute auxiliary polynomials commitment"):
            auxiliary_polys_commitment = PolynomialBatch.from_values(
                aux_np, rate_bits, False, cap_height, hasher
            )
        challenger.observe_cap(auxiliary_polys_commitment.merkle_tree.cap)

    alphas_prime = challenger.get_n_challenges(config.num_challenges)

    g_root = fs.primitive_root_of_unity(degree_bits)

    # Constraint binding (reference prover.rs:261-370): evaluate constraints
    # on simulated openings, observe, then draw the real quotient alphas.
    pow_degree = max(2, constraint_degree + 1)
    poly_evals = get_dummy_polys(
        challenger, stark.COLUMNS, num_auxiliary_polys, pow_degree
    )
    zeta_prime = challenger.get_extension_challenge(2)
    num_lookup_columns = stark.num_lookup_helper_columns(config)
    dummy_ctl_vars = None
    if ctl_data is not None:
        from plonky2_tpu.starky.cross_table_lookup import CtlCheckVars

        dummy_ctl_vars = CtlCheckVars.from_proof(
            ctl_data.zs_columns, poly_evals.auxiliary_polys,
            poly_evals.auxiliary_polys_next, num_lookup_columns,
            ctl_data.num_ctl_helper_polys(),
        )
    constraints = compute_eval_vanishing_poly(
        stark, poly_evals, public_inputs, alphas_prime, zeta_prime, degree_bits,
        lookup_challenges=lookup_challenges, num_lookup_columns=num_lookup_columns,
        ctl_vars=dummy_ctl_vars,
    )
    challenger.observe_extension_elements(constraints)

    alphas = challenger.get_n_challenges(config.num_challenges)

    with timing.scope("compute quotient polys"):
        quotient_chunks = _compute_quotient_polys(
            stark, config, trace_commitment, public_inputs, alphas, degree_bits,
            auxiliary_polys_commitment, lookup_challenges, ctl_data,
            num_lookup_columns,
        )

    with timing.scope("compute quotient commitment"):
        quotient_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, False, cap_height, hasher
        )
    challenger.observe_cap(quotient_commitment.merkle_tree.cap)

    zeta = challenger.get_extension_challenge(2)
    if fs.ext_exp(zeta, degree) == fs.ext_one(2):
        raise ValueError("Opening point is in the subgroup.")

    num_ctl_polys = ctl_data.num_ctl_helper_polys() if ctl_data is not None else []
    with timing.scope("openings"):
        openings = _opening_set(zeta, g_root, trace_commitment, quotient_commitment,
                                auxiliary_polys_commitment,
                                requires_ctls=ctl_data is not None,
                                num_lookup_columns=num_lookup_columns,
                                num_ctl_polys=num_ctl_polys)

    for batch in openings.to_fri_openings().batches:
        challenger.observe_extension_elements(batch.values)

    instance = stark.fri_instance(
        zeta, g_root, sum(num_ctl_polys),
        [0] * (len(ctl_data.zs_columns) if ctl_data is not None else 0), config,
    )
    oracles = [trace_commitment]
    if auxiliary_polys_commitment is not None:
        oracles.append(auxiliary_polys_commitment)
    oracles.append(quotient_commitment)
    with timing.scope("FRI opening proof"):
        opening_proof = PolynomialBatch.prove_openings(
            instance,
            oracles,
            challenger,
            fri_params,
            final_poly_coeff_len=final_poly_coeff_len,
            max_num_query_steps=max_num_query_steps,
            hasher=hasher,
        )

    proof = StarkProof(
        trace_cap=trace_commitment.merkle_tree.cap,
        auxiliary_polys_cap=(auxiliary_polys_commitment.merkle_tree.cap
                             if auxiliary_polys_commitment is not None else None),
        quotient_polys_cap=quotient_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
    )
    return StarkProofWithPublicInputs(proof=proof, public_inputs=list(public_inputs))


_QUOTIENT_FN_CACHE: dict = {}


def _make_quotient_fn(stark, config, degree_bits: int, ctl_data=None,
                      num_lookup_columns=0):
    """One fused device program: all AIR constraints (+ logUp lookups and
    CTLs) over the quotient coset (reference compute_quotient_polys,
    prover.rs:488-670)."""
    qdf = stark.quotient_degree_factor()
    qd_bits = (qdf - 1).bit_length()  # log2_ceil(qdf)
    n = 1 << degree_bits
    num_challenges = config.num_challenges
    uses_lookups = stark.uses_lookups()
    next_step = 1 << qd_bits

    def f(trace_q, next_trace_q, aux_q, lookup_chs, pis, alphas, xs, z_h_inv,
          l_first, l_last, z_last):
        ops = DeviceBaseOps()
        frame = StarkFrame(
            [trace_q[i] for i in range(trace_q.shape[0])],
            [next_trace_q[i] for i in range(next_trace_q.shape[0])],
            [pis[i] for i in range(pis.shape[0])],
        )
        consumer = ConstraintConsumer(
            ops,
            [alphas[i] for i in range(num_challenges)],
            z_last, l_first, l_last,
        )
        lookup_vars = None
        if uses_lookups:
            from plonky2_tpu.starky.lookup import LookupCheckVars

            lookup_vars = LookupCheckVars(
                [aux_q[i] for i in range(aux_q.shape[0])],
                [jnp.roll(aux_q[i], -next_step) for i in range(aux_q.shape[0])],
                [lookup_chs[i] for i in range(num_challenges)],
            )
        ctl_vars = None
        if ctl_data is not None:
            from plonky2_tpu.starky.cross_table_lookup import CtlCheckVars

            aux_local = [aux_q[i] for i in range(aux_q.shape[0])]
            aux_next = [jnp.roll(aux_q[i], -next_step) for i in range(aux_q.shape[0])]
            ctl_vars = CtlCheckVars.from_proof(
                ctl_data.zs_columns, aux_local, aux_next, num_lookup_columns,
                ctl_data.num_ctl_helper_polys(),
            )
        eval_vanishing_poly(ops, stark, frame, consumer, lookup_vars, ctl_vars,
                            stark.constraint_degree())
        Q = xs.shape[0]
        evals = jnp.stack([
            jnp.broadcast_to(a, (Q,)) for a in consumer.accumulators()
        ])  # [nc, Q]
        quotient_values = g.mul(evals, z_h_inv[None])
        coeffs = ntt.coset_ifft(quotient_values)  # [nc, Q]
        return coeffs.reshape(-1, n)  # [nc*qdf, n]

    from plonky2_tpu.util.export_cache import persistent_jit

    return persistent_jit(f, name="starky.prover.quotient"), qd_bits


def _stark_pj_key(stark, config, degree_bits, ctl_data, num_lookup_columns):
    """Persistent-export-cache key for the STARK quotient closure, or None
    (bypass persistence) when the AIR's parameters have no stable repr."""
    import hashlib

    parts = repr((
        f"{type(stark).__module__}.{type(stark).__qualname__}",
        sorted(vars(stark).items(), key=lambda kv: kv[0]) if vars(stark) else (),
        repr(config), degree_bits, num_lookup_columns,
        repr(ctl_data) if ctl_data is not None else "",
    ))
    if " at 0x" in parts:  # address-bearing repr: unstable across processes
        return None
    return hashlib.sha256(parts.encode()).hexdigest()[:16]


def _compute_quotient_polys(stark, config, trace_commitment, public_inputs,
                            alphas, degree_bits: int,
                            auxiliary_polys_commitment=None, lookup_challenges=None,
                            ctl_data=None, num_lookup_columns=0):
    key = (id(stark), id(config), degree_bits, ctl_data is not None)
    cached = _QUOTIENT_FN_CACHE.get(key)
    if cached is None:
        cached = _make_quotient_fn(stark, config, degree_bits, ctl_data,
                                   num_lookup_columns)
        _QUOTIENT_FN_CACHE[key] = cached
    fn, qd_bits = cached

    n = 1 << degree_bits
    Q = n << qd_bits
    rate_bits = config.fri_config.rate_bits
    assert qd_bits <= rate_bits, (
        "Having constraints of degree higher than the rate is not supported yet."
    )
    step = 1 << (rate_bits - qd_bits)
    next_step = 1 << qd_bits

    trace_q = trace_commitment.lde[:, ::step]  # [cols, Q] natural order
    next_trace_q = jnp.roll(trace_q, -next_step, axis=1)
    if auxiliary_polys_commitment is not None:
        aux_q = auxiliary_polys_commitment.lde[:, ::step]
        lookup_chs = jnp.asarray(np.asarray(lookup_challenges or [], dtype=np.uint64))
    else:
        aux_q = jnp.zeros((0, Q), dtype=jnp.uint64)
        lookup_chs = jnp.zeros((0,), dtype=jnp.uint64)

    # domain points and periodic Z_H / Lagrange-selector tables
    v = fs.primitive_root_of_unity(qd_bits + degree_bits)
    xs = g.np_powers(v, Q)
    xs = np.asarray(
        (xs.astype(object) * fs.MULTIPLICATIVE_GROUP_GENERATOR) % fs.P, dtype=np.uint64
    )
    u = fs.exp(v, n)
    shift_pow_n = fs.exp(fs.MULTIPLICATIVE_GROUP_GENERATOR, n)
    z_h_vals = [fs.sub(fs.mul(shift_pow_n, fs.exp(u, j)), 1) for j in range(1 << qd_bits)]
    z_h_inv = np.tile(
        np.asarray(fs.batch_inverse(z_h_vals), dtype=np.uint64), Q // (1 << qd_bits)
    )

    # Lagrange first/last selectors LDE'd onto the quotient coset
    sel_first = np.zeros((n,), dtype=np.uint64)
    sel_first[0] = 1
    sel_last = np.zeros((n,), dtype=np.uint64)
    sel_last[n - 1] = 1
    sel = jnp.asarray(np.stack([sel_first, sel_last]))
    sel_lde = ntt.coset_lde(ntt.ifft(sel), qd_bits)  # [2, Q]

    last = fs.inverse(fs.primitive_root_of_unity(degree_bits))
    z_last = g.sub(jnp.asarray(xs), jnp.asarray(np.uint64(last)))

    return fn(
        trace_q, next_trace_q, aux_q, lookup_chs,
        jnp.asarray(np.asarray(public_inputs, dtype=np.uint64)),
        jnp.asarray(np.asarray(alphas, dtype=np.uint64)),
        jnp.asarray(xs), jnp.asarray(z_h_inv),
        sel_lde[0], sel_lde[1], z_last,
        _pj_key=_stark_pj_key(stark, config, degree_bits, ctl_data,
                              num_lookup_columns),
    )


def _opening_set(zeta, g_root, trace_commitment, quotient_commitment,
                 auxiliary_polys_commitment=None, requires_ctls=False,
                 num_lookup_columns=0, num_ctl_polys=()) -> StarkOpeningSet:
    from plonky2_tpu.plonk.prover import _eval_commitment

    zeta_next = fs.ext_scalar_mul(g_root, zeta)
    aux = aux_next = ctl_zs_first = None
    if auxiliary_polys_commitment is not None:
        aux = _eval_commitment(zeta, auxiliary_polys_commitment)
        aux_next = _eval_commitment(zeta_next, auxiliary_polys_commitment)
        if requires_ctls:
            # aux polys evaluated at the base point 1 = sum of coefficients
            coeff_sums = np.asarray(
                g.sum_mod(auxiliary_polys_commitment.polynomials, axis=1)
            )
            start = num_lookup_columns + sum(num_ctl_polys)
            ctl_zs_first = [int(v) for v in coeff_sums[start:]]
    return StarkOpeningSet(
        local_values=_eval_commitment(zeta, trace_commitment),
        next_values=_eval_commitment(zeta_next, trace_commitment),
        auxiliary_polys=aux,
        auxiliary_polys_next=aux_next,
        ctl_zs_first=ctl_zs_first,
        quotient_polys=_eval_commitment(zeta, quotient_commitment),
    )
