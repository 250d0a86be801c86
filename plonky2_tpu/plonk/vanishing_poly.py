"""Vanishing-polynomial evaluation, written ONCE over the generic ops protocol.

Reference plonk/vanishing_poly.rs keeps three hand-synchronized copies of this
logic (scalar extension for the verifier :57-164, SIMD base batch for the
prover :167+, circuit targets for recursion :802+). Here a single definition is
instantiated with HostExtOps (verifier at zeta), DeviceBaseOps (prover: whole
quotient domain as one fused XLA program), or CircuitOps (recursive verifier),
so constraint order is identical by construction.

Challenges (betas/gammas/alphas) and the point x are pre-lifted ops-domain
values supplied by the caller, as are L_0(x) and the partial-product openings.
"""

from __future__ import annotations

from plonky2_tpu.gates.gate import compute_filter
from plonky2_tpu.gates.ops import EvaluationVars


def reduce_with_powers(ops, terms, alpha):
    """sum_i alpha^i * terms[i], reverse-Horner (reference plonk_common.rs)."""
    acc = ops.zero()
    for t in reversed(terms):
        acc = ops.add(ops.mul(alpha, acc), t)
    return acc


def evaluate_gate_constraints(ops, common, vars) -> list:
    """Filtered constraint accumulation over all gates
    (reference vanishing_poly.rs:671-755)."""
    constraints = [ops.zero()] * common.num_gate_constraints
    num_selectors = common.selectors_info.num_selectors
    num_lookup_selectors = common.num_lookup_selectors
    gate_vars = EvaluationVars(
        vars.local_constants[num_selectors + num_lookup_selectors:],
        vars.local_wires,
        vars.public_inputs_hash,
    )
    for i, gate in enumerate(common.gates):
        selector_index = common.selectors_info.selector_indices[i]
        f = compute_filter(
            ops,
            i,
            common.selectors_info.groups[selector_index],
            vars.local_constants[selector_index],
            num_selectors > 1,
        )
        for k, c in enumerate(gate.eval_unfiltered(ops, gate_vars)):
            constraints[k] = ops.add(constraints[k], ops.mul(f, c))
    return constraints


def check_partial_products(ops, numerators, denominators, partials, z_x, z_gx,
                           max_degree) -> list:
    """Chunked partial-product consistency terms
    (reference util/partial_products.rs:63-107)."""
    product_accs = [z_x] + list(partials) + [z_gx]
    terms = []
    num_chunks = (len(numerators) + max_degree - 1) // max_degree
    for c in range(num_chunks):
        nume_chunk = numerators[c * max_degree:(c + 1) * max_degree]
        deno_chunk = denominators[c * max_degree:(c + 1) * max_degree]
        num_prod = nume_chunk[0]
        for v in nume_chunk[1:]:
            num_prod = ops.mul(num_prod, v)
        den_prod = deno_chunk[0]
        for v in deno_chunk[1:]:
            den_prod = ops.mul(den_prod, v)
        prev_acc, next_acc = product_accs[c], product_accs[c + 1]
        terms.append(ops.sub(ops.mul(next_acc, den_prod), ops.mul(prev_acc, num_prod)))
    return terms


def eval_vanishing_poly(ops, common, x, vars, local_zs, next_zs, partial_products,
                        s_sigmas, betas, gammas, alphas, l_0_x) -> list:
    """Returns one alpha-combined vanishing value per challenge
    (reference vanishing_poly.rs:57-164). All inputs are ops-domain values."""
    config = common.config
    num_challenges = config.num_challenges
    num_prods = common.num_partial_products
    max_degree = common.quotient_degree_factor

    constraint_terms = evaluate_gate_constraints(ops, common, vars)

    vanishing_z_1_terms = []
    vanishing_partial_products_terms = []
    for i in range(num_challenges):
        z_x = local_zs[i]
        z_gx = next_zs[i]
        # L_0(x) * (Z(x) - 1)
        vanishing_z_1_terms.append(ops.mul(l_0_x, ops.add_const(z_x, -1)))

        numerator_values = []
        denominator_values = []
        for j in range(config.num_routed_wires):
            wire_value = vars.local_wires[j]
            s_id = ops.mul_const(common.k_is[j], x)
            numerator_values.append(
                ops.add(wire_value, ops.add(ops.mul(betas[i], s_id), gammas[i]))
            )
            denominator_values.append(
                ops.add(wire_value, ops.add(ops.mul(betas[i], s_sigmas[j]), gammas[i]))
            )
        current_partial_products = partial_products[i * num_prods:(i + 1) * num_prods]
        vanishing_partial_products_terms.extend(
            check_partial_products(ops, numerator_values, denominator_values,
                                   current_partial_products, z_x, z_gx, max_degree)
        )

    vanishing_terms = (vanishing_z_1_terms + vanishing_partial_products_terms
                       + constraint_terms)
    return [reduce_with_powers(ops, vanishing_terms, a) for a in alphas]
