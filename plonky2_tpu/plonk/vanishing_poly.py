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


# Lookup challenge roles within each 4-delta block
# (reference vanishing_poly.rs LookupChallenges)
CHALLENGE_A = 0
CHALLENGE_B = 1
CHALLENGE_ALPHA = 2
CHALLENGE_DELTA = 3
NUM_COINS_LOOKUP = 4


def get_lut_poly(common, lut_index: int, deltas: list[int], degree: int):
    """Coefficients (ascending) of the LUT-binding polynomial
    sum (in + b*out) X^i, padded and REVERSED (reference vanishing_poly.rs:30)."""
    from plonky2_tpu.field import scalar as fs
    from plonky2_tpu.gates.lookup import LookupTableGate

    b = deltas[CHALLENGE_B]
    lut = common.luts[lut_index]
    nb_slots = LookupTableGate.num_slots_from_config(common.config)
    n = len(lut)
    nb_padded = (nb_slots - n % nb_slots) % nb_slots
    pad_i, pad_o = lut[0]
    coeffs = [fs.add(i, fs.mul(b, o)) for i, o in lut]
    coeffs += [fs.add(pad_i, fs.mul(b, pad_o))] * nb_padded
    coeffs += [0] * (degree - (n + nb_padded))
    coeffs.reverse()
    return coeffs


def eval_lut_poly(common, lut_index: int, deltas: list[int]) -> int:
    """get_lut_poly evaluated at ChallengeDelta (host scalar, per proof)."""
    from plonky2_tpu.field import scalar as fs
    from plonky2_tpu.gates.lookup import LookupTableGate

    num_lut_slots = LookupTableGate.num_slots_from_config(common.config)
    lut_row_number = -(-len(common.luts[lut_index]) // num_lut_slots)
    coeffs = get_lut_poly(common, lut_index, deltas, num_lut_slots * lut_row_number)
    # coeffs are ASCENDING (reference PolynomialCoeffs); Horner from the top.
    acc = 0
    for c in reversed(coeffs):
        acc = fs.add(fs.mul(acc, deltas[CHALLENGE_DELTA]), c)
    return acc


def eval_lut_poly_circuit(builder, common, lut_index: int, deltas) -> "Target":
    """get_lut_poly evaluated at ChallengeDelta with b/delta as circuit
    targets; LUT entries are compile-time constants (reference
    vanishing_poly.rs:756-794 get_lut_poly_circuit). Returns a base Target
    numerically equal to the host eval_lut_poly value."""
    from plonky2_tpu.gates.lookup import LookupTableGate

    b = deltas[CHALLENGE_B]
    delta = deltas[CHALLENGE_DELTA]
    lut = common.luts[lut_index]
    nb_slots = LookupTableGate.num_slots_from_config(common.config)
    lut_row_number = -(-len(lut) // nb_slots)
    degree = nb_slots * lut_row_number
    n = len(lut)
    nb_padded = (nb_slots - n % nb_slots) % nb_slots
    pad_i, pad_o = lut[0]

    coeffs = [builder.add_const(builder.mul_const(o, b), i) for i, o in lut]
    coeffs += [builder.add_const(builder.mul_const(pad_o, b), pad_i)] * nb_padded
    zero = builder.zero()
    coeffs += [zero] * (degree - (n + nb_padded))
    coeffs.reverse()
    # ascending coeffs, Horner from the top (same order as host eval_lut_poly)
    acc = zero
    for c in reversed(coeffs):
        acc = builder.add(builder.mul(acc, delta), c)
    return acc


def check_lookup_constraints(ops, common, vars, local_lookup_zs, next_lookup_zs,
                             lookup_selectors, deltas, lut_re_evals) -> list:
    """Lookup argument constraints for ONE challenge's 4-delta block
    (reference vanishing_poly.rs:343-515). deltas are ops-domain values;
    lut_re_evals[lut] is the pre-lifted get_lut_poly(delta) evaluation."""
    from plonky2_tpu.gates.lookup import LookupGate, LookupTableGate

    num_lu_slots = LookupGate.num_slots_from_config(common.config)
    num_lut_slots = LookupTableGate.num_slots_from_config(common.config)
    lu_degree = common.quotient_degree_factor - 1
    num_sldc_polys = len(local_lookup_zs) - 1
    lut_degree = -(-num_lut_slots // num_sldc_polys)

    SEL_TRANS_SRE, SEL_TRANS_LDC, SEL_INIT_SRE, SEL_LAST_LDC, SEL_START_END = range(5)

    constraints = []
    z_re = local_lookup_zs[0]
    next_z_re = next_lookup_zs[0]
    z_x_sldcs = local_lookup_zs[1:]
    z_gx_sldcs = next_lookup_zs[1:]

    da = deltas[CHALLENGE_A]
    looked_combos = [
        ops.add(vars.local_wires[LookupTableGate.wire_ith_looked_inp(s)],
                ops.mul(da, vars.local_wires[LookupTableGate.wire_ith_looked_out(s)]))
        for s in range(num_lut_slots)
    ]
    looking_combos = [
        ops.add(vars.local_wires[LookupGate.wire_ith_looking_inp(s)],
                ops.mul(da, vars.local_wires[LookupGate.wire_ith_looking_out(s)]))
        for s in range(num_lu_slots)
    ]
    db = deltas[CHALLENGE_B]
    lookup_combos = [
        ops.add(vars.local_wires[LookupTableGate.wire_ith_looked_inp(s)],
                ops.mul(db, vars.local_wires[LookupTableGate.wire_ith_looked_out(s)]))
        for s in range(num_lut_slots)
    ]

    # last LDC == 0; initial Sum == 0; initial RE == 0
    constraints.append(ops.mul(lookup_selectors[SEL_LAST_LDC], z_x_sldcs[-1]))
    constraints.append(ops.mul(lookup_selectors[SEL_INIT_SRE], z_x_sldcs[0]))
    constraints.append(ops.mul(lookup_selectors[SEL_INIT_SRE], z_re))

    # final RE per LUT
    for r in range(SEL_START_END, common.num_lookup_selectors):
        cur_ends_selector = lookup_selectors[r]
        cur_function_eval = lut_re_evals[r - SEL_START_END]
        constraints.append(
            ops.mul(cur_ends_selector, ops.sub(z_re, cur_function_eval))
        )

    # RE row transition
    dd = deltas[CHALLENGE_DELTA]
    cur_sum = next_z_re
    for elt in lookup_combos:
        cur_sum = ops.add(ops.mul(cur_sum, dd), elt)
    constraints.append(
        ops.mul(lookup_selectors[SEL_TRANS_SRE], ops.sub(z_re, cur_sum))
    )

    dalpha = deltas[CHALLENGE_ALPHA]
    alpha_minus_looked = [ops.sub(dalpha, c) for c in looked_combos]
    alpha_minus_looking = [ops.sub(dalpha, c) for c in looking_combos]

    def prod(terms):
        acc = ops.one()
        for t in terms:
            acc = ops.mul(acc, t)
        return acc

    for poly in range(num_sldc_polys):
        lut_rng = range(poly * lut_degree, min((poly + 1) * lut_degree, num_lut_slots))
        lu_rng = range(poly * lu_degree, min((poly + 1) * lu_degree, num_lu_slots))

        lut_prod = prod([alpha_minus_looked[i] for i in lut_rng])
        lu_prod = prod([alpha_minus_looking[i] for i in lu_rng])

        lu_sum_prods = ops.zero()
        for i in lu_rng:
            lu_sum_prods = ops.add(
                lu_sum_prods, prod([alpha_minus_looking[j] for j in lu_rng if j != i])
            )
        lut_sum_prods_with_mul = ops.zero()
        for i in lut_rng:
            term = ops.mul(
                vars.local_wires[LookupTableGate.wire_ith_multiplicity(i)],
                prod([alpha_minus_looked[j] for j in lut_rng if j != i]),
            )
            lut_sum_prods_with_mul = ops.add(lut_sum_prods_with_mul, term)

        prev = z_gx_sldcs[-1] if poly == 0 else z_x_sldcs[poly - 1]
        diff = ops.sub(z_x_sldcs[poly], prev)
        constraints.append(
            ops.mul(lookup_selectors[SEL_TRANS_SRE],
                    ops.sub(ops.mul(lut_prod, diff), lut_sum_prods_with_mul))
        )
        constraints.append(
            ops.mul(lookup_selectors[SEL_TRANS_LDC],
                    ops.add(ops.mul(lu_prod, diff), lu_sum_prods))
        )

    return constraints


def eval_vanishing_poly(ops, common, x, vars, local_zs, next_zs, partial_products,
                        s_sigmas, betas, gammas, alphas, l_0_x,
                        local_lookup_zs=None, next_lookup_zs=None, deltas=None,
                        lut_re_evals=None) -> list:
    """Returns one alpha-combined vanishing value per challenge
    (reference vanishing_poly.rs:57-164). All inputs are ops-domain values;
    deltas has NUM_COINS_LOOKUP values per challenge and lut_re_evals is
    [num_challenges][num_luts] when lookups are present."""
    config = common.config
    num_challenges = config.num_challenges
    num_prods = common.num_partial_products
    max_degree = common.quotient_degree_factor
    has_lookup = common.num_lookup_polys != 0

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

    vanishing_all_lookup_terms = []
    if has_lookup:
        num_sel = common.selectors_info.num_selectors
        lookup_selectors = vars.local_constants[num_sel:num_sel + common.num_lookup_selectors]
        nlp = common.num_lookup_polys
        for i in range(num_challenges):
            cur_local = local_lookup_zs[nlp * i:nlp * (i + 1)]
            cur_next = next_lookup_zs[nlp * i:nlp * (i + 1)]
            cur_deltas = deltas[NUM_COINS_LOOKUP * i:NUM_COINS_LOOKUP * (i + 1)]
            vanishing_all_lookup_terms.extend(
                check_lookup_constraints(ops, common, vars, cur_local, cur_next,
                                         lookup_selectors, cur_deltas, lut_re_evals[i])
            )

    vanishing_terms = (vanishing_z_1_terms + vanishing_partial_products_terms
                       + vanishing_all_lookup_terms + constraint_terms)
    return [reduce_with_powers(ops, vanishing_terms, a) for a in alphas]
