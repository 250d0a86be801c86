"""PLONK prover (reference plonk/prover.rs:113-815), TPU-native.

Host/device split: witness generation and the Fiat-Shamir transcript run on
host; each prover round is one (per-circuit, shape-static) jitted XLA program:

  round 1  wires commitment        IFFT + coset LDE + Merkle    (fri/oracle.py)
  round 2  partial products & Zs   batched inverses + modular prefix scans
                                   (lax.associative_scan replaces the
                                   reference's sequential row loop :365-449)
  round 3  quotient polynomials    all gate constraints over the whole
                                   quotient domain in ONE fused program
                                   (replaces 32-point SIMD chunking :607-815)
  openings + FRI                   fri/oracle.py prove_openings

There are exactly five host<->device sync points per proof: the three caps,
zeta openings, and the per-fold FRI betas — matching the reference's
Fiat-Shamir structure.
"""

from __future__ import annotations

import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import ntt
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.gates.ops import DeviceBaseOps, EvaluationVars
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.plonk import config as pcfg
from plonky2_tpu.util.export_cache import persistent_jit
from plonky2_tpu.plonk.proof import OpeningSet, Proof, ProofWithPublicInputs
from plonky2_tpu.plonk.vanishing_poly import (
    NUM_COINS_LOOKUP,
    CHALLENGE_A,
    CHALLENGE_ALPHA,
    CHALLENGE_B,
    CHALLENGE_DELTA,
    check_lookup_constraints,
    eval_lut_poly,
    eval_vanishing_poly,
)
from plonky2_tpu.util import TimingTree


import logging

_log = logging.getLogger("plonky2_tpu.prover")

# Test introspection (tests/test_fri_path_matrix.py): which transcript the
# last prove used — "fused" (device-resident DeviceChallenger) or "host".
_LAST_TRANSCRIPT = None


def set_lookup_wires(prover_data, common, pw) -> None:
    """Fill LookupGate padding + LookupTableGate multiplicities
    (reference plonk/prover.rs:41-111)."""
    from plonky2_tpu.gates.lookup import LookupGate, LookupTableGate
    from plonky2_tpu.iop.target import Wire

    for lut_index, lw in enumerate(prover_data.lookup_rows):
        lut = common.luts[lut_index]
        num_entries = LookupGate.num_slots_from_config(common.config)
        num_lut_entries = LookupTableGate.num_slots_from_config(common.config)
        multiplicities = [0] * len(lut)
        value_to_idx = {inp: i for i, (inp, _) in enumerate(lut)}

        for inp_target, _ in prover_data.lut_to_lookups[lut_index]:
            inp_value = pw.get_target(inp_target)
            multiplicities[value_to_idx[inp_value]] += 1

        # pad the last LookupGate with the first LUT entry
        num_lookups = len(prover_data.lut_to_lookups[lut_index])
        remaining = (num_entries - num_lookups % num_entries) % num_entries
        first_inp, first_out = lut[0]
        for slot in range(num_entries - remaining, num_entries):
            pw.set_target(
                Wire(lw.last_lut_gate - 1, LookupGate.wire_ith_looking_inp(slot)), first_inp
            )
            pw.set_target(
                Wire(lw.last_lut_gate - 1, LookupGate.wire_ith_looking_out(slot)), first_out
            )
            multiplicities[0] += 1

        for lut_entry in range(len(lut)):
            row = lw.first_lut_gate - lut_entry // num_lut_entries
            col = lut_entry % num_lut_entries
            pw.set_target(
                Wire(row, LookupTableGate.wire_ith_multiplicity(col)),
                multiplicities[lut_entry],
            )


def compute_lookup_polys(witness, deltas4, prover_data, common):
    """RE + partial-SLDC columns for one challenge's deltas, host row
    recurrences over the (small) lookup region (reference prover.rs:458-605).
    witness: [num_wires, degree] numpy."""
    from plonky2_tpu.gates.lookup import LookupGate, LookupTableGate

    degree = common.degree
    num_lu_slots = LookupGate.num_slots_from_config(common.config)
    max_lookup_degree = common.config.max_quotient_degree_factor - 1
    num_partial_lookups = -(-num_lu_slots // max_lookup_degree)
    num_lut_slots = LookupTableGate.num_slots_from_config(common.config)
    max_lookup_table_degree = -(-num_lut_slots // num_partial_lookups)

    polys = [[0] * degree for _ in range(num_partial_lookups + 1)]
    w = lambda row, col: int(witness[col, row])
    da, db, dalpha, ddelta = (deltas4[CHALLENGE_A], deltas4[CHALLENGE_B],
                              deltas4[CHALLENGE_ALPHA], deltas4[CHALLENGE_DELTA])

    for lw in prover_data.lookup_rows:
        for row in range(lw.first_lut_gate, lw.last_lut_gate - 1, -1):
            looked = [
                fs.add(w(row, LookupTableGate.wire_ith_looked_inp(s)),
                       fs.mul(da, w(row, LookupTableGate.wire_ith_looked_out(s))))
                for s in range(num_lut_slots)
            ]
            inv = fs.batch_inverse([fs.sub(dalpha, c) for c in looked])
            lookup_combos = [
                fs.add(w(row, LookupTableGate.wire_ith_looked_inp(s)),
                       fs.mul(db, w(row, LookupTableGate.wire_ith_looked_out(s))))
                for s in range(num_lut_slots)
            ]
            new_re = polys[0][(row + 1) % degree]
            for elt in lookup_combos:
                new_re = fs.add(fs.mul(new_re, ddelta), elt)
            polys[0][row] = new_re
            for slot in range(num_partial_lookups):
                prev = (polys[slot][row] if slot != 0
                        else polys[num_partial_lookups][(row + 1) % degree])
                acc = prev
                for sidx in range(slot * max_lookup_table_degree,
                                  min((slot + 1) * max_lookup_table_degree, num_lut_slots)):
                    acc = fs.add(acc, fs.mul(
                        w(row, LookupTableGate.wire_ith_multiplicity(sidx)), inv[sidx]))
                polys[slot + 1][row] = acc

        for row in range(lw.last_lut_gate - 1, lw.last_lu_gate - 1, -1):
            looking = [
                fs.add(w(row, LookupGate.wire_ith_looking_inp(s)),
                       fs.mul(da, w(row, LookupGate.wire_ith_looking_out(s))))
                for s in range(num_lu_slots)
            ]
            inv = fs.batch_inverse([fs.sub(dalpha, c) for c in looking])
            for slot in range(num_partial_lookups):
                prev = (polys[num_partial_lookups][(row + 1) % degree] if slot == 0
                        else polys[slot][row])
                acc = 0
                for sidx in range(slot * max_lookup_degree,
                                  min((slot + 1) * max_lookup_degree, num_lu_slots)):
                    acc = fs.add(acc, inv[sidx])
                polys[slot + 1][row] = fs.sub(prev, acc)

    return polys


# -- device lookup polynomials (fused-transcript path) ------------------------


def _mod_affine_prefix(a, b):
    """Inclusive prefix of affine maps x -> a*x + b over Goldilocks:
    returns (A, B) with x_i = A_i * x_{-1} + B_i. Log-depth associative
    scan — the TPU dual of the reference's sequential RE row recurrence
    (plonk/prover.rs:458-523)."""
    def comb(left, right):
        la, lb = left
        ra, rb = right
        return g.mul(la, ra), g.add(g.mul(lb, ra), rb)

    return jax.lax.associative_scan(comb, (a, b))


def _lookup_polys_fn(degree, nc, num_lut_slots, num_lu_slots,
                     max_lookup_degree, max_lookup_table_degree,
                     num_partial, regions):
    """Build the jitted device program computing ALL lookup columns
    (RE + partial-SLDC per challenge) from wire-region slices and the
    device-resident delta draws. Bit-identical to compute_lookup_polys
    (the host row recurrences become one associative scan per region:
    RE is a first-order affine recurrence, the SLDC running sum is a
    modular prefix sum; intra-row chunk structure is static).

    regions: tuple of (first_lut_gate, last_lut_gate, last_lu_gate).
    Call signature: f(deltas[4*nc], *per-region (inp, out, mult, lu_inp,
    lu_out)) -> [nc*(num_partial+1), degree]."""

    def f(deltas, *region_arrays):
        out_polys = []
        for c in range(nc):
            da = deltas[NUM_COINS_LOOKUP * c + CHALLENGE_A]
            db = deltas[NUM_COINS_LOOKUP * c + CHALLENGE_B]
            dalpha = deltas[NUM_COINS_LOOKUP * c + CHALLENGE_ALPHA]
            ddelta = deltas[NUM_COINS_LOOKUP * c + CHALLENGE_DELTA]
            re_poly = jnp.zeros((degree,), jnp.uint64)
            cols = [jnp.zeros((degree,), jnp.uint64) for _ in range(num_partial)]
            for ri, (first, last_lut, last_lu) in enumerate(regions):
                inp, out, mult, lu_inp, lu_out = region_arrays[5 * ri:5 * ri + 5]
                rows_lut = np.arange(first, last_lut - 1, -1)
                rows_lu = np.arange(last_lut - 1, last_lu - 1, -1)
                carry_re = re_poly[(first + 1) % degree]
                carry_s = cols[num_partial - 1][(first + 1) % degree]

                # -- LUT rows: RE recurrence + multiplicity/inverse sums -----
                inv_lut = g.inverse(g.sub(dalpha, g.add(inp, g.mul(da, out))))
                combos = g.add(inp, g.mul(db, out))
                e = jnp.zeros((rows_lut.size,), jnp.uint64)
                for s in range(num_lut_slots):
                    e = g.add(g.mul(e, ddelta), combos[:, s])
                D = g.exp_u64(ddelta, num_lut_slots)
                b = e.at[0].set(g.add(e[0], g.mul(D, carry_re)))
                a = jnp.broadcast_to(D, (rows_lut.size,))
                _, re_col = _mod_affine_prefix(a, b)

                mi = g.mul(mult, inv_lut)
                # num_partial is derived from the LookupGate slot count, so a
                # trailing LUT chunk can be empty — the host loop then adds
                # nothing (col[slot+1] = col[slot])
                chunk_lut = [
                    (g.sum_mod(mi[:, s0:min(s0 + max_lookup_table_degree,
                                            num_lut_slots)], axis=1)
                     if s0 < num_lut_slots
                     else jnp.zeros((rows_lut.size,), jnp.uint64))
                    for s0 in range(0, num_partial * max_lookup_table_degree,
                                    max_lookup_table_degree)
                ]
                total_lut = chunk_lut[0]
                for ch in chunk_lut[1:]:
                    total_lut = g.add(total_lut, ch)
                s_incl = jax.lax.associative_scan(g.add, total_lut)
                s_before = jnp.concatenate(
                    [jnp.broadcast_to(carry_s, (1,)),
                     g.add(carry_s, s_incl[:-1])])
                prefix = chunk_lut[0]
                cols_lut = [g.add(s_before, prefix)]
                for ch in chunk_lut[1:]:
                    prefix = g.add(prefix, ch)
                    cols_lut.append(g.add(s_before, prefix))

                re_poly = re_poly.at[rows_lut].set(re_col)
                carry_lu = g.add(carry_s, s_incl[-1])

                # -- LookupGate rows: inverse sums, subtracted ----------------
                if rows_lu.size:
                    inv_lu = g.inverse(
                        g.sub(dalpha, g.add(lu_inp, g.mul(da, lu_out))))
                    chunk_lu = [
                        g.sum_mod(inv_lu[:, s0:min(s0 + max_lookup_degree,
                                                   num_lu_slots)], axis=1)
                        for s0 in range(0, num_partial * max_lookup_degree,
                                        max_lookup_degree)
                    ]
                    total_lu = chunk_lu[0]
                    for ch in chunk_lu[1:]:
                        total_lu = g.add(total_lu, ch)
                    s_incl_lu = jax.lax.associative_scan(g.add, total_lu)
                    s_before_lu = jnp.concatenate(
                        [jnp.broadcast_to(carry_lu, (1,)),
                         g.sub(jnp.broadcast_to(carry_lu, s_incl_lu[:-1].shape),
                               s_incl_lu[:-1])])
                    prefix = chunk_lu[0]
                    cols_lu = [g.sub(s_before_lu, prefix)]
                    for ch in chunk_lu[1:]:
                        prefix = g.add(prefix, ch)
                        cols_lu.append(g.sub(s_before_lu, prefix))
                    for p in range(num_partial):
                        cols[p] = (cols[p].at[rows_lut].set(cols_lut[p])
                                   .at[rows_lu].set(cols_lu[p]))
                else:
                    for p in range(num_partial):
                        cols[p] = cols[p].at[rows_lut].set(cols_lut[p])
            out_polys.append(re_poly)
            out_polys.extend(cols)
        return jnp.stack(out_polys)

    return persistent_jit(f, name="plonk.prover.lookup_polys")


_LOOKUP_POLYS_FN_CACHE: dict[int, object] = {}


def compute_lookup_polys_device(witness, deltas_dev, prover_data, common):
    """Device dual of compute_lookup_polys for ALL challenges at once.
    witness: [num_wires, degree] host numpy; deltas_dev: [4*nc] device
    draws from the fused transcript. Returns [nc*(num_partial+1), degree]
    device array in the host path's column order (RE, SLDC_1.., per
    challenge)."""
    from plonky2_tpu.gates.lookup import LookupGate, LookupTableGate

    degree = common.degree
    nc = common.config.num_challenges
    num_lu_slots = LookupGate.num_slots_from_config(common.config)
    max_lookup_degree = common.config.max_quotient_degree_factor - 1
    num_partial = -(-num_lu_slots // max_lookup_degree)
    num_lut_slots = LookupTableGate.num_slots_from_config(common.config)
    max_lookup_table_degree = -(-num_lut_slots // num_partial)

    regions = tuple((lw.first_lut_gate, lw.last_lut_gate, lw.last_lu_gate)
                    for lw in prover_data.lookup_rows)
    key = (id(common), regions)
    fn = _LOOKUP_POLYS_FN_CACHE.get(key)
    if fn is None:
        fn = _lookup_polys_fn(degree, nc, num_lut_slots, num_lu_slots,
                              max_lookup_degree, max_lookup_table_degree,
                              num_partial, regions)
        _LOOKUP_POLYS_FN_CACHE[key] = fn

    args = []
    for first, last_lut, last_lu in regions:
        rows_lut = np.arange(first, last_lut - 1, -1)
        rows_lu = np.arange(last_lut - 1, last_lu - 1, -1)
        lut_cols_in = [LookupTableGate.wire_ith_looked_inp(s)
                       for s in range(num_lut_slots)]
        lut_cols_out = [LookupTableGate.wire_ith_looked_out(s)
                        for s in range(num_lut_slots)]
        lut_cols_m = [LookupTableGate.wire_ith_multiplicity(s)
                      for s in range(num_lut_slots)]
        lu_cols_in = [LookupGate.wire_ith_looking_inp(s)
                      for s in range(num_lu_slots)]
        lu_cols_out = [LookupGate.wire_ith_looking_out(s)
                       for s in range(num_lu_slots)]
        args.append(jnp.asarray(witness[np.ix_(lut_cols_in, rows_lut)].T))
        args.append(jnp.asarray(witness[np.ix_(lut_cols_out, rows_lut)].T))
        args.append(jnp.asarray(witness[np.ix_(lut_cols_m, rows_lut)].T))
        args.append(jnp.asarray(witness[np.ix_(lu_cols_in, rows_lu)].T))
        args.append(jnp.asarray(witness[np.ix_(lu_cols_out, rows_lu)].T))
    pj_key = f"{_common_pj_key(common)}|{regions}"
    return fn(deltas_dev, *args, _pj_key=pj_key)


_LUT_EVALS_FN_CACHE: dict[int, object] = {}


def _lut_evals_device(common, deltas_dev):
    """Device dual of eval_lut_poly for all (challenge, lut) pairs:
    value = sum_j (in_j + b*out_j) * delta^(N-1-j) over the padded LUT
    (reference vanishing_poly.rs:30 get_lut_poly + Horner eval). Returns
    [nc, num_luts] device array — keeps the fused transcript on device
    where the host path would fetch the deltas to evaluate on CPU."""
    from plonky2_tpu.gates.lookup import LookupTableGate

    key = id(common)
    fn = _LUT_EVALS_FN_CACHE.get(key)
    if fn is None:
        num_lut_slots = LookupTableGate.num_slots_from_config(common.config)
        nc = common.config.num_challenges
        tables = []
        for lut in common.luts:
            n = len(lut)
            rows = -(-n // num_lut_slots)
            N = num_lut_slots * rows
            pad_i, pad_o = lut[0]
            ins = np.asarray([i for i, _ in lut] + [pad_i] * (N - n),
                             dtype=np.uint64)
            outs = np.asarray([o for _, o in lut] + [pad_o] * (N - n),
                              dtype=np.uint64)
            tables.append((ins, outs))

        def f(deltas):
            rows_out = []
            for c in range(nc):
                db = deltas[NUM_COINS_LOOKUP * c + CHALLENGE_B]
                dd = deltas[NUM_COINS_LOOKUP * c + CHALLENGE_DELTA]
                vals = []
                for ins, outs in tables:
                    combo = g.add(jnp.asarray(ins), g.mul(db, jnp.asarray(outs)))
                    pows = g.powers(dd, ins.shape[0])[::-1]
                    vals.append(g.sum_mod(g.mul(combo, pows)))
                rows_out.append(jnp.stack(vals))
            return jnp.stack(rows_out)

        fn = persistent_jit(f, name="plonk.prover.lut_evals")
        _LUT_EVALS_FN_CACHE[key] = fn
    return fn(deltas_dev, _pj_key=_common_pj_key(common))


def prepare_witness(prover_data, common, inputs,
                    timing: TimingTree | None = None):
    """The host witness phase of a prove: generator execution (native
    witness plan), lookup wire fill, public-input hash, full witness
    matrix. ALL prover rng draws for a non-zk circuit happen here, so
    running prepares in proof order keeps threaded prove_many
    byte-identical to sequential proves."""
    timing = timing or TimingTree("prepare")
    gc = common.generic_config()
    with timing.scope("generate partial witness"):
        partition_witness = generate_partial_witness(inputs, prover_data,
                                                     common)
    if common.num_lookup_polys != 0:
        set_lookup_wires(prover_data, common, partition_witness)
    public_inputs = partition_witness.get_targets(prover_data.public_inputs)
    public_inputs_hash = gc.inner_hasher.hash_no_pad(public_inputs)
    with timing.scope("compute full witness"):
        witness = partition_witness.full_witness()  # [num_wires, degree]
    return witness, public_inputs, public_inputs_hash


def prove(prover_data, common, inputs, timing: TimingTree | None = None,
          _defer: bool = False, _prepared=None) -> ProofWithPublicInputs:
    """_defer=True (internal, prove_many): dispatch the whole device chain
    and return a zero-argument finish() closure instead of blocking on the
    device->host fetch — only valid on the fused-transcript path; a
    host-path prove completes eagerly and returns a closure over the done
    proof. _prepared: output of prepare_witness (threaded prove_many runs
    the witness phase on the caller thread for rng-order determinism)."""
    timing = timing or TimingTree("prove")
    config = common.config
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    num_challenges = config.num_challenges
    zk = config.zero_knowledge
    degree = common.degree

    gc = common.generic_config()
    hasher = gc.hasher

    has_lookup = common.num_lookup_polys != 0

    if _prepared is None:
        _prepared = prepare_witness(prover_data, common, inputs, timing)
    witness, public_inputs, public_inputs_hash = _prepared

    with timing.scope("wires commitment"):
        # ONE witness upload per proof: the commitment and round 2 share the
        # same device copy (the tunnel serializes transfers with compute, so
        # re-uploading the routed rows cost ~28 ms/proof at degree 2^12)
        witness_dev = jnp.asarray(witness)
        wires_commitment = PolynomialBatch.from_values(
            witness_dev, rate_bits, zk and pcfg.WIRES.blinding, cap_height,
            hasher=hasher
        )

    challenger = Challenger(hasher)
    common.fri_params.observe(challenger)
    challenger.observe_hash(prover_data.circuit_digest)
    challenger.observe_hash(public_inputs_hash)

    global _LAST_TRANSCRIPT
    if _can_fuse_transcript(common, hasher, has_lookup, prover_data,
                            wires_commitment):
        _LAST_TRANSCRIPT = "fused"
        out = _prove_fused(prover_data, common, challenger, wires_commitment,
                           witness, witness_dev, public_inputs,
                           public_inputs_hash, timing, defer=_defer)
        if _log.isEnabledFor(logging.DEBUG) and not _defer:
            timing.print(min_seconds=0.01)
        return out

    _LAST_TRANSCRIPT = "host"
    challenger.observe_cap(wires_commitment.merkle_tree.cap)

    betas = challenger.get_n_challenges(num_challenges)
    gammas = challenger.get_n_challenges(num_challenges)

    if has_lookup:
        num_lookup_challenges = NUM_COINS_LOOKUP * num_challenges
        additional = challenger.get_n_challenges(num_lookup_challenges - 2 * num_challenges)
        deltas = betas + gammas + additional
    else:
        deltas = []

    with timing.scope("partial products and Zs"):
        wires_values_routed = witness_dev[: config.num_routed_wires]
        zs_partial_products = _all_partial_products_and_zs(
            wires_values_routed, prover_data, common, betas, gammas
        )

    if has_lookup:
        with timing.scope("compute lookup polys"):
            all_lookup_polys = []
            for c in range(num_challenges):
                all_lookup_polys.extend(compute_lookup_polys(
                    witness, deltas[c * NUM_COINS_LOOKUP:(c + 1) * NUM_COINS_LOOKUP],
                    prover_data, common,
                ))
            lookup_np = np.asarray(all_lookup_polys, dtype=np.uint64)
            zs_partial_products = jnp.concatenate(
                [zs_partial_products, jnp.asarray(lookup_np)], axis=0
            )

    with timing.scope("zs_partial_products commitment"):
        partial_products_zs_commitment = PolynomialBatch.from_values(
            zs_partial_products, rate_bits,
            zk and pcfg.ZS_PARTIAL_PRODUCTS.blinding, cap_height, hasher=hasher,
        )

    challenger.observe_cap(partial_products_zs_commitment.merkle_tree.cap)
    alphas = challenger.get_n_challenges(num_challenges)

    with timing.scope("quotient polys"):
        quotient_chunks = _compute_quotient_polys(
            prover_data, common,
            prover_data.constants_sigmas_commitment,
            wires_commitment,
            partial_products_zs_commitment,
            public_inputs_hash, betas, gammas, alphas, deltas,
        )

    with timing.scope("quotient commitment"):
        quotient_polys_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, zk and pcfg.QUOTIENT.blinding, cap_height,
            hasher=hasher,
        )

    challenger.observe_cap(quotient_polys_commitment.merkle_tree.cap)
    zeta = challenger.get_extension_challenge(2)
    # Like the reference (plonk/prover.rs:306-314): zeta must lie outside H.
    if fs.ext_exp(zeta, degree) == fs.ext_one(2):
        raise ValueError("Opening point is in the subgroup.")

    g_root = fs.primitive_root_of_unity(common.degree_bits)

    with timing.scope("openings"):
        openings = _opening_set(
            zeta, g_root,
            prover_data.constants_sigmas_commitment,
            wires_commitment,
            partial_products_zs_commitment,
            quotient_polys_commitment,
            common,
        )

    for batch in openings.to_fri_openings().batches:
        challenger.observe_extension_elements(batch.values)

    instance = common.get_fri_instance(zeta)
    with timing.scope("FRI opening proof"):
        opening_proof = PolynomialBatch.prove_openings(
            instance,
            [prover_data.constants_sigmas_commitment, wires_commitment,
             partial_products_zs_commitment, quotient_polys_commitment],
            challenger,
            common.fri_params,
            hasher=hasher,
        )

    proof = Proof(
        wires_cap=wires_commitment.merkle_tree.cap,
        plonk_zs_partial_products_cap=partial_products_zs_commitment.merkle_tree.cap,
        quotient_polys_cap=quotient_polys_commitment.merkle_tree.cap,
        openings=openings,
        opening_proof=opening_proof,
    )
    if _log.isEnabledFor(logging.DEBUG):
        timing.print(min_seconds=0.01)
    out = ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)
    if _defer:  # host path completes eagerly; keep the prove_many contract
        return lambda: out
    return out


# -- round 2: permutation partial products & Z polynomials -------------------


@persistent_jit(static_argnums=(5,))
def _round2_one_challenge(wires_routed, sigmas, k_is, subgroup, beta_gamma, qdf):
    """Per-row quotients -> chunk products -> modular prefix scans.

    Reference plonk/prover.rs:365-449 computes per-row chunk products in
    parallel then runs a SEQUENTIAL row loop for Z; here Z is an exclusive
    modular-product scan (lax.associative_scan), fully parallel.

    Returns ([n] Z values, [num_prods, n] partial products).
    """
    beta, gamma = beta_gamma[0], beta_gamma[1]
    s_id = g.mul(k_is[:, None], subgroup[None, :])  # [R, n]
    numer = g.add(wires_routed, g.add(g.mul(beta, s_id), gamma))
    denom = g.add(wires_routed, g.add(g.mul(beta, sigmas), gamma))
    quot = g.mul(numer, g.inverse_rows(denom))  # [R, n]

    R, n = quot.shape
    num_chunks = (R + qdf - 1) // qdf
    if num_chunks * qdf != R:
        pad = jnp.ones((num_chunks * qdf - R, n), dtype=jnp.uint64)
        quot = jnp.concatenate([quot, pad], axis=0)
    chunks = quot.reshape(num_chunks, qdf, n)
    chunk_products = chunks[:, 0, :]
    for j in range(1, qdf):
        chunk_products = g.mul(chunk_products, chunks[:, j, :])

    # inclusive cumulative chunk products within a row: [num_chunks, n]
    cumprods = jax.lax.associative_scan(g.mul, chunk_products, axis=0)
    row_products = cumprods[-1]  # [n]

    # Z: exclusive modular-product scan over rows, Z(g^0) = 1
    z_incl = jax.lax.associative_scan(g.mul, row_products)
    one = jnp.ones((1,), dtype=jnp.uint64)
    z = jnp.concatenate([one, z_incl[:-1]])

    partial_products = g.mul(z[None, :], cumprods[:-1])  # [num_chunks-1, n]
    return z, partial_products


def _round2_device_tables(prover_data, common):
    """Per-circuit device-resident round-2 constants (sigmas, k_is,
    subgroup). Cached on prover_data: re-uploading sigmas (~2.6 MB at
    degree 2^12) every prove costs a host->device transfer per proof —
    pure overhead in the pipelined throughput path."""
    from plonky2_tpu.parallel import active_mesh, replicate, shard_lanes

    key = (id(common), active_mesh() and id(active_mesh()))
    cached = getattr(prover_data, "_round2_tables", None)
    if cached is not None and cached[0] == key:
        return cached[1]
    tables = (
        shard_lanes(jnp.asarray(prover_data.sigmas)),
        replicate(jnp.asarray(np.asarray(common.k_is, dtype=np.uint64))),
        shard_lanes(jnp.asarray(np.asarray(prover_data.subgroup,
                                           dtype=np.uint64))),
    )
    prover_data._round2_tables = (key, tables)
    return tables


def _all_partial_products_and_zs(wires_values_routed, prover_data, common, betas, gammas):
    """[num_challenges*(1+num_prods), degree]: all Z polys first, then the
    partial products per challenge (reference prover.rs:220-257 layout)."""
    from plonky2_tpu.parallel import replicate, shard_lanes

    qdf = common.quotient_degree_factor
    zs = []
    pps = []
    # lane-sharded: rows (evaluation points) are the long axis; the scans
    # lower to sharded associative scans (reference prover.rs:407-433 row-par)
    wires_values_routed = shard_lanes(wires_values_routed)
    sigmas, k_is, subgroup = _round2_device_tables(prover_data, common)
    device_draws = isinstance(betas, jax.Array)  # fused transcript path
    for i in range(common.config.num_challenges):
        bg = (jnp.stack([betas[i], gammas[i]]) if device_draws
              else jnp.asarray(np.asarray([betas[i], gammas[i]], dtype=np.uint64)))
        z, pp = _round2_one_challenge(wires_values_routed, sigmas, k_is, subgroup,
                                      replicate(bg), qdf)
        zs.append(z)
        pps.append(pp)
    return jnp.concatenate([jnp.stack(zs)] + pps, axis=0)


# -- round 3: quotient polynomials -------------------------------------------

_QUOTIENT_FN_CACHE: dict[int, object] = {}


def _make_quotient_fn(common):
    """Build the per-circuit fused quotient program. Static over the circuit
    (gates, selector groups, k_is); traced over all per-proof arrays.

    Fully tensorized: wires/constants stay [num_polys, Q] arrays and gate
    constraints come from Gate.eval_unfiltered_device, so the XLA graph is
    a few hundred tensor primitives regardless of gate complexity (the
    unrolled-scalar form lowers ~100x slower). Same math and identical
    constraint/term ordering as vanishing_poly.eval_vanishing_poly."""
    from plonky2_tpu.gates.gate import UNUSED_SELECTOR

    qdf = common.quotient_degree_factor
    n = common.degree
    num_constants = common.num_constants
    num_routed = common.config.num_routed_wires
    num_challenges = common.config.num_challenges
    num_prods = common.num_partial_products
    num_selectors = common.selectors_info.num_selectors
    num_lookup_selectors = common.num_lookup_selectors
    zs_idx = list(common.zs_range())
    pp_idx = list(common.partial_products_range())
    lookup_idx = list(common.lookup_range())
    has_lookup = common.num_lookup_polys != 0
    k_is_np = np.asarray(common.k_is, dtype=np.uint64)
    num_chunks = (num_routed + qdf - 1) // qdf
    pad = num_chunks * qdf - num_routed

    def f(constants_sigmas_q, wires_q, zs_pp_q, betas, gammas, alphas, deltas,
          lut_re_evals, pi_hash, xs, z_h, z_h_inv):
        Q = xs.shape[0]
        one = jnp.ones((), dtype=jnp.uint64)

        # L_0(x) = Z_H(x) / (n * (x - 1)) pointwise on the coset
        l_0_x = g.mul(z_h, g.inverse(g.mul_scalar(g.sub(xs, one), n % fs.P)))

        # -- gate constraints, filtered and accumulated [num_gate_constraints, Q]
        gate_constants = constants_sigmas_q[num_selectors + num_lookup_selectors:num_constants]
        acc = jnp.zeros((common.num_gate_constraints, Q), dtype=jnp.uint64)
        for i, gate in enumerate(common.gates):
            sel_idx = common.selectors_info.selector_indices[i]
            s = constants_sigmas_q[sel_idx]
            filt = one
            for k in common.selectors_info.groups[sel_idx]:
                if k == i:
                    continue
                filt = g.mul(filt, g.sub(jnp.asarray(np.uint64(k)), s))
            if num_selectors > 1:
                filt = g.mul(filt, g.sub(jnp.asarray(np.uint64(UNUSED_SELECTOR)), s))
            ev = gate.eval_unfiltered_device(wires_q, gate_constants, pi_hash)
            k = ev.shape[0]
            if k == 0:
                continue
            ev = g.mul(jnp.broadcast_to(filt, (k, Q)), ev)
            if k < common.num_gate_constraints:
                ev = jnp.concatenate(
                    [ev, jnp.zeros((common.num_gate_constraints - k, Q), dtype=jnp.uint64)]
                )
            acc = g.add(acc, ev)

        # -- permutation argument terms
        sigmas = constants_sigmas_q[num_constants:num_constants + num_routed]
        s_id = g.mul(jnp.asarray(k_is_np)[:, None], xs[None, :])  # [R, Q]
        wires_routed = wires_q[:num_routed]
        z1_terms = []
        pp_terms = []
        for i in range(num_challenges):
            beta, gamma = betas[i], gammas[i]
            z_x = zs_pp_q[zs_idx[i]]
            z_gx = jnp.roll(z_x, -qdf)
            z1_terms.append(g.mul(l_0_x, g.sub(z_x, one))[None])

            numer = g.add(wires_routed, g.add(g.mul(beta, s_id), gamma))
            denom = g.add(wires_routed, g.add(g.mul(beta, sigmas), gamma))
            if pad:
                ones = jnp.ones((pad, Q), dtype=jnp.uint64)
                numer = jnp.concatenate([numer, ones])
                denom = jnp.concatenate([denom, ones])
            numc = numer.reshape(num_chunks, qdf, Q)
            denc = denom.reshape(num_chunks, qdf, Q)
            num_prod = numc[:, 0]
            den_prod = denc[:, 0]
            for j in range(1, qdf):
                num_prod = g.mul(num_prod, numc[:, j])
                den_prod = g.mul(den_prod, denc[:, j])
            pps = jnp.stack([zs_pp_q[pp_idx[i * num_prods + c]] for c in range(num_prods)])
            accs = jnp.concatenate([z_x[None], pps, z_gx[None]])  # [num_chunks+1, Q]
            pp_terms.append(
                g.sub(g.mul(accs[1:], den_prod), g.mul(accs[:-1], num_prod))
            )

        lookup_terms = []
        if has_lookup:
            from plonky2_tpu.plonk.vanishing_poly import (
                NUM_COINS_LOOKUP,
                check_lookup_constraints,
            )

            ops = DeviceBaseOps()
            vars = EvaluationVars(
                [constants_sigmas_q[j] for j in range(num_constants)],
                [wires_q[j] for j in range(wires_q.shape[0])],
                [pi_hash[k] for k in range(4)],
            )
            num_sel = common.selectors_info.num_selectors
            lookup_selectors = vars.local_constants[
                num_sel:num_sel + common.num_lookup_selectors]
            nlp = common.num_lookup_polys
            for i in range(num_challenges):
                cur_local = [zs_pp_q[lookup_idx[nlp * i + j]] for j in range(nlp)]
                cur_next = [jnp.roll(zs_pp_q[lookup_idx[nlp * i + j]], -qdf)
                            for j in range(nlp)]
                cur_deltas = [deltas[NUM_COINS_LOOKUP * i + j]
                              for j in range(NUM_COINS_LOOKUP)]
                cur_lut_evals = [lut_re_evals[i, l]
                                 for l in range(lut_re_evals.shape[1])]
                terms = check_lookup_constraints(
                    ops, common, vars, cur_local, cur_next, lookup_selectors,
                    cur_deltas, cur_lut_evals,
                )
                lookup_terms.extend(t[None] if t.ndim == 1 else
                                    jnp.broadcast_to(t, (1, Q)) for t in terms)

        all_terms = jnp.concatenate(z1_terms + pp_terms + lookup_terms + [acc])  # [T, Q]
        T = all_terms.shape[0]

        # -- alpha reduction per challenge, then divide by Z_H
        vanishing = []
        for i in range(num_challenges):
            ap = g.powers(alphas[i], T)  # [T]
            vanishing.append(g.sum_mod(g.mul(ap[:, None], all_terms), axis=0))
        quotient_values = g.mul(jnp.stack(vanishing), z_h_inv[None])  # [nc, Q]
        coeffs = ntt.coset_ifft(quotient_values)  # [nc, Q]
        return coeffs.reshape(-1, n)  # [nc*qdf, n]: chunks t_0..t_{qdf-1} per challenge

    return persistent_jit(f, name="plonk.prover.quotient")


def _common_pj_key(common) -> str:
    """Stable digest of everything the quotient program closes over —
    distinguishes same-shaped programs of different circuits in the
    persistent export cache."""
    key = getattr(common, "_pj_key", None)
    if key is None:
        import hashlib

        si = common.selectors_info
        parts = (
            common.degree, common.quotient_degree_factor, common.num_constants,
            common.config.num_routed_wires, common.config.num_challenges,
            common.num_partial_products, common.num_lookup_polys,
            common.num_lookup_selectors, tuple(common.k_is),
            tuple(si.selector_indices), tuple(map(tuple, si.groups)),
            tuple(gate.id() for gate in common.gates),
            tuple(tuple(lut) for lut in getattr(common, "luts", ()) or ()),
        )
        key = hashlib.sha256(repr(parts).encode()).hexdigest()[:16]
        try:
            common._pj_key = key
        except Exception:
            pass
    return key


def _compute_quotient_polys(prover_data, common, constants_sigmas_commitment,
                            wires_commitment, zs_pp_commitment,
                            public_inputs_hash, betas, gammas, alphas, deltas=()):
    key = id(common)
    fn = _QUOTIENT_FN_CACHE.get(key)
    if fn is None:
        fn = _make_quotient_fn(common)
        _QUOTIENT_FN_CACHE[key] = fn

    qdf = common.quotient_degree_factor
    qd_bits = qdf.bit_length() - 1
    n = common.degree
    Q = qdf * n
    rate_bits = common.config.fri_config.rate_bits
    assert rate_bits >= qd_bits
    step = 1 << (rate_bits - qd_bits)

    # natural-order sub-LDE: stride-`step` subsample of the stored LDE;
    # point-sharded under an active mesh (embarrassingly parallel map over
    # the evaluation domain, reference plonk/prover.rs:607-687)
    from plonky2_tpu.parallel import active_mesh, shard_lanes

    cs_q = shard_lanes(constants_sigmas_commitment.lde[:, ::step])
    wires_q = shard_lanes(wires_commitment.lde[:, ::step])
    zs_pp_q = shard_lanes(zs_pp_commitment.lde[:, ::step])

    # domain points x = shift * v^j (v the Q-th root) and Z_H(x)^-1 (period
    # qdf); cached device-resident per (circuit, mesh) — the object-dtype
    # host math + upload would otherwise repeat every prove
    dt_key = (id(common), active_mesh() and id(active_mesh()))
    cached = prover_data.quotient_domain_tables
    if cached is not None and cached[0] == dt_key:
        xs_dev, z_h_dev, z_h_inv_dev = cached[1]
    else:
        v = fs.primitive_root_of_unity(qd_bits + common.degree_bits)
        xs = g.np_powers(v, Q)
        xs = np.asarray(
            (xs.astype(object) * fs.MULTIPLICATIVE_GROUP_GENERATOR) % fs.P,
            dtype=np.uint64)
        u = fs.exp(v, n)  # order qdf
        shift_pow_n = fs.exp(fs.MULTIPLICATIVE_GROUP_GENERATOR, n)
        z_h_vals = [fs.sub(fs.mul(shift_pow_n, fs.exp(u, j)), 1)
                    for j in range(qdf)]
        z_h = np.tile(np.asarray(z_h_vals, dtype=np.uint64), Q // qdf)
        z_h_inv = np.tile(
            np.asarray(fs.batch_inverse(z_h_vals), dtype=np.uint64), Q // qdf)
        xs_dev = shard_lanes(jnp.asarray(xs))
        z_h_dev = shard_lanes(jnp.asarray(z_h))
        z_h_inv_dev = shard_lanes(jnp.asarray(z_h_inv))
        prover_data.quotient_domain_tables = (
            dt_key, (xs_dev, z_h_dev, z_h_inv_dev))

    nc = common.config.num_challenges
    if common.num_lookup_polys:
        if isinstance(deltas, jax.Array):
            # fused transcript: deltas are device draws — evaluate the
            # LUT-binding polys on device, no host fetch
            lut_re_evals = _lut_evals_device(common, deltas)
            deltas_arr = deltas
        else:
            lut_re_evals = jnp.asarray(np.asarray(
                [[eval_lut_poly(common, l, list(deltas[c * NUM_COINS_LOOKUP:(c + 1) * NUM_COINS_LOOKUP]))
                  for l in range(len(common.luts))]
                 for c in range(nc)],
                dtype=np.uint64,
            ))
            deltas_arr = jnp.asarray(np.asarray(deltas, dtype=np.uint64))
    else:
        lut_re_evals = jnp.asarray(np.zeros((nc, 0), dtype=np.uint64))
        deltas_arr = jnp.asarray(np.zeros((0,), dtype=np.uint64))

    def _draws(x):  # host ints or device draws from the fused transcript
        return x if isinstance(x, jax.Array) else jnp.asarray(
            np.asarray(x, dtype=np.uint64))

    return fn(
        cs_q, wires_q, zs_pp_q,
        _draws(betas), _draws(gammas), _draws(alphas),
        deltas_arr, lut_re_evals,
        jnp.asarray(np.asarray(public_inputs_hash, dtype=np.uint64)),
        xs_dev, z_h_dev, z_h_inv_dev,
        _pj_key=_common_pj_key(common),
    )


# -- openings ----------------------------------------------------------------


@persistent_jit
def _eval_polys_at(coeffs, z):
    """Evaluate [J, n] base-coeff polys at the ext point z = (z0, z1).

    Jitted: the eager form dispatched ~600 ops (and as many per-shape
    remote compiles under axon) per opening-set evaluation."""
    n = coeffs.shape[-1]
    zp0, zp1 = g.ext2_powers((z[0], z[1]), n)
    e0 = g.sum_mod(g.mul(coeffs, zp0[None, :]), axis=1)
    e1 = g.sum_mod(g.mul(coeffs, zp1[None, :]), axis=1)
    return e0, e1


def _eval_commitment(z: tuple, commitment) -> list[tuple]:
    zd = jnp.asarray(np.asarray(list(z), dtype=np.uint64))
    e0, e1 = _eval_polys_at(commitment.polynomials, zd)
    e0 = np.asarray(e0)
    e1 = np.asarray(e1)
    return [(int(a), int(b)) for a, b in zip(e0, e1)]


@persistent_jit
def _eval_opening_set(cs, wires, zs_pp, quot, zz):
    """All opening-set evaluations in ONE program, packed into one [2, total]
    array: [cs@z | wires@z | zs_pp@z | zs_pp@gz | quot@z]. One device->host
    fetch instead of five (each fetch is a full tunnel round trip)."""
    z = (zz[0], zz[1])
    gz = (zz[2], zz[3])
    outs0, outs1 = [], []
    for coeffs, point in ((cs, z), (wires, z), (zs_pp, z), (zs_pp, gz), (quot, z)):
        n = coeffs.shape[-1]
        zp0, zp1 = g.ext2_powers(point, n)
        outs0.append(g.sum_mod(g.mul(coeffs, zp0[None, :]), axis=1))
        outs1.append(g.sum_mod(g.mul(coeffs, zp1[None, :]), axis=1))
    return jnp.stack([jnp.concatenate(outs0), jnp.concatenate(outs1)])


def _opening_set(zeta, g_root, constants_sigmas_commitment, wires_commitment,
                 zs_partial_products_commitment, quotient_polys_commitment,
                 common) -> OpeningSet:
    """Reference plonk/proof.rs:314-351."""
    zeta_next = fs.ext_scalar_mul(g_root, zeta)
    zz = jnp.asarray(np.asarray(list(zeta) + list(zeta_next), dtype=np.uint64))
    # uniform placement: under a mesh the build-time constants/sigmas oracle
    # lives on one device while prove-time oracles are sharded — one program
    # cannot mix committed placements
    from plonky2_tpu.parallel import shard_lanes

    packed = np.asarray(_eval_opening_set(
        shard_lanes(constants_sigmas_commitment.polynomials),
        shard_lanes(wires_commitment.polynomials),
        shard_lanes(zs_partial_products_commitment.polynomials),
        shard_lanes(quotient_polys_commitment.polynomials), zz))
    n_cs = constants_sigmas_commitment.polynomials.shape[0]
    n_w = wires_commitment.polynomials.shape[0]
    n_z = zs_partial_products_commitment.polynomials.shape[0]
    off = np.cumsum([0, n_cs, n_w, n_z, n_z])
    segs = [
        [(int(a), int(b)) for a, b in zip(packed[0, s:e], packed[1, s:e])]
        for s, e in zip(off, list(off[1:]) + [packed.shape[1]])
    ]
    cs_eval, wires_eval, zs_pp_eval, zs_pp_next_eval, quot_eval = segs
    return OpeningSet(
        constants=[cs_eval[i] for i in common.constants_range()],
        plonk_sigmas=[cs_eval[i] for i in common.sigmas_range()],
        wires=wires_eval,
        plonk_zs=[zs_pp_eval[i] for i in common.zs_range()],
        plonk_zs_next=[zs_pp_next_eval[i] for i in common.zs_range()],
        partial_products=[zs_pp_eval[i] for i in common.partial_products_range()],
        quotient_polys=quot_eval,
        lookup_zs=[zs_pp_eval[i] for i in common.lookup_range()],
        lookup_zs_next=[zs_pp_next_eval[i] for i in common.lookup_range()],
    )


# -- fully fused prove: device-resident Fiat-Shamir transcript ----------------


def _can_fuse_transcript(common, hasher, has_lookup, prover_data,
                         wires_commitment) -> bool:
    """The fused path needs: Poseidon transcript (DeviceChallenger), >=1 FRI
    fold step (the fused FRI program), and device-resident natural-layout
    trees on every oracle. Lookup circuits are handled since round 4: the
    RE/SLDC row recurrences run as device associative scans
    (compute_lookup_polys_device) and the LUT-binding evals as device
    Horner sums (_lut_evals_device), so the delta draws never leave the
    device."""
    from plonky2_tpu.fri import prover as fri_prover
    from plonky2_tpu.hash.hashers import PoseidonHasher
    from plonky2_tpu.hash.merkle import NaturalMerkleTree

    if fri_prover._FORCE_HOST:
        return False
    if hasher is not PoseidonHasher:
        return False
    if not tuple(common.fri_params.reduction_arity_bits):
        return False
    cs_tree = prover_data.constants_sigmas_commitment.merkle_tree
    return (isinstance(wires_commitment.merkle_tree, NaturalMerkleTree)
            and isinstance(cs_tree, NaturalMerkleTree))


@functools.lru_cache(maxsize=None)
def _openings_final_fn(n_cs, n_w, n_z, n_q, nc, degree_bits, rate_bits,
                       n_zpp=None):
    """ONE jit for the opening argument's transcript segment: evaluate every
    committed polynomial at zeta / g*zeta, observe the openings in
    FRI-openings order (reference plonk/proof.rs:352-393), draw the FRI
    alpha, and compute the FRI final polynomial (per-batch composition
    quotients with ReducingFactor::shift_poly semantics, reference
    fri/oracle.rs:176-237 + util/reducing.rs:100) — all on device scalars,
    no host round trip. n_zpp = Zs + partial-product row count of the
    zs_pp oracle; rows beyond it are lookup polys, which fri_all_polys
    orders LAST (after the quotient) and fri_next_batch_polys opens at
    g*zeta after the Zs (plonk/circuit_data.py:125-131)."""
    from plonky2_tpu.fri.oracle import _batch_quotient_impl, _ext2_pow_static
    from plonky2_tpu.iop.challenger import DeviceChallenger

    g_root = fs.primitive_root_of_unity(degree_bits)
    if n_zpp is None:
        n_zpp = n_z

    # packed layout: [cs@z | wires@z | zs_pp@z | zs_pp@gz | quot@z]
    o_cs, o_w = 0, n_cs
    o_z, o_zg, o_q = n_cs + n_w, n_cs + n_w + n_z, n_cs + n_w + 2 * n_z
    # batch 0 = all polys @ zeta (fri_all_polys order: lookups after the
    # quotient), batch 1 = Zs then lookups @ g*zeta
    lookup_rows = list(range(n_zpp, n_z))
    batch0 = (list(range(o_cs, o_cs + n_cs)) + list(range(o_w, o_w + n_w))
              + list(range(o_z, o_z + n_zpp)) + list(range(o_q, o_q + n_q))
              + [o_z + i for i in lookup_rows])
    batch1 = list(range(o_zg, o_zg + nc)) + [o_zg + i for i in lookup_rows]
    # the same polys as (oracle, row) pairs for the final-poly quotients
    mats0 = ([(0, i) for i in range(n_cs)] + [(1, i) for i in range(n_w)]
             + [(2, i) for i in range(n_zpp)] + [(3, i) for i in range(n_q)]
             + [(2, i) for i in lookup_rows])
    mats1 = [(2, i) for i in range(nc)] + [(2, i) for i in lookup_rows]

    def f(sponge, zdraw, cs, wires, zs_pp, quot):
        z = (zdraw[0], zdraw[1])
        gr = jnp.asarray(np.uint64(g_root))
        gz = (g.mul(gr, zdraw[0]), g.mul(gr, zdraw[1]))
        outs0, outs1 = [], []
        for coeffs, point in ((cs, z), (wires, z), (zs_pp, z), (zs_pp, gz),
                              (quot, z)):
            n = coeffs.shape[-1]
            zp0, zp1 = g.ext2_powers(point, n)
            outs0.append(g.sum_mod(g.mul(coeffs, zp0[None, :]), axis=1))
            outs1.append(g.sum_mod(g.mul(coeffs, zp1[None, :]), axis=1))
        p0 = jnp.concatenate(outs0)
        p1 = jnp.concatenate(outs1)

        dc = DeviceChallenger(sponge, [])
        for idx in batch0 + batch1:
            dc.observe_element(p0[idx])
            dc.observe_element(p1[idx])
        alpha = (dc.get_challenge(), dc.get_challenge())

        mats = (cs, wires, zs_pp, quot)
        n = cs.shape[-1]
        final = (jnp.zeros((n,), jnp.uint64), jnp.zeros((n,), jnp.uint64))
        for point, polys in ((z, mats0), (gz, mats1)):
            stacked = jnp.stack([mats[oi][pi] for oi, pi in polys])
            q = _batch_quotient_impl(stacked, alpha, point, rate_bits)
            shift = _ext2_pow_static(alpha, len(polys))
            final = g.ext2_add(g.ext2_mul(shift, final), q)

        packed = jnp.stack([p0, p1])
        zz = jnp.stack([zdraw[0], zdraw[1], gz[0], gz[1]])
        return packed, zz, final[0], final[1], dc.state

    pj = persistent_jit(f, name="plonk.prover.openings_final")
    key = repr((n_cs, n_w, n_z, n_q, nc, degree_bits, rate_bits, n_zpp))
    return lambda *a: pj(*a, _pj_key=key)


def _prove_fused(prover_data, common, challenger, wires_commitment, witness,
                 witness_dev, public_inputs, public_inputs_hash,
                 timing, defer: bool = False) -> ProofWithPublicInputs:
    """Prove with a DEVICE-resident Fiat-Shamir transcript: after the host
    observes the pre-cap prefix (params, digest, PI hash), every transcript
    interaction — the three commitment caps, the openings, the FRI fold
    betas, PoW and query draws — runs inside jitted programs
    (DeviceChallenger), and the caps + openings + zeta + the whole FRI
    argument return in ONE device->host fetch. Byte-identical proofs to the
    host path (the reference runs the same transcript on host between rayon
    phases, plonk/prover.rs:113-815); this removes the per-phase
    device->host round trips that dominated warm-prove latency over the
    axon tunnel (ROOFLINE.md)."""
    from plonky2_tpu.fri.prover import _fri_proof_fused
    from plonky2_tpu.iop.challenger import cap_boundary_fn
    from plonky2_tpu.parallel import replicate, shard_lanes

    config = common.config
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    nc = config.num_challenges
    zk = config.zero_knowledge
    degree = common.degree
    hasher = common.generic_config().hasher
    C = 1 << cap_height

    # move the host transcript prefix onto device
    k0 = len(challenger.input_buffer)
    sponge = replicate(jnp.asarray(
        np.asarray(challenger.sponge_state, dtype=np.uint64)))
    pend = replicate(jnp.asarray(
        np.asarray(challenger.input_buffer, dtype=np.uint64)))
    no_pend = replicate(jnp.zeros((0,), dtype=jnp.uint64))

    # boundary 1: absorb wires cap -> betas, gammas (+ lookup deltas; the
    # host path's betas+gammas+additional are the same draw stream,
    # reference plonk/get_challenges.rs:57-68)
    has_lookup = common.num_lookup_polys != 0
    ndraws1 = (NUM_COINS_LOOKUP if has_lookup else 2) * nc
    b1 = cap_boundary_fn(k0, cap_height, True, ndraws1)
    sponge, _, draws1, cap_w = b1(
        sponge, pend, replicate(wires_commitment.merkle_tree.cap_dev))
    betas, gammas = draws1[:nc], draws1[nc:2 * nc]

    with timing.scope("partial products and Zs"):
        wires_values_routed = witness_dev[: config.num_routed_wires]
        zs_partial_products = _all_partial_products_and_zs(
            wires_values_routed, prover_data, common, betas, gammas)

    if has_lookup:
        with timing.scope("compute lookup polys"):
            zs_partial_products = jnp.concatenate(
                [zs_partial_products,
                 compute_lookup_polys_device(witness, draws1, prover_data,
                                             common)], axis=0)

    with timing.scope("zs_partial_products commitment"):
        partial_products_zs_commitment = PolynomialBatch.from_values(
            zs_partial_products, rate_bits,
            zk and pcfg.ZS_PARTIAL_PRODUCTS.blinding, cap_height,
            hasher=hasher)

    # boundary 2: absorb Z/partial-products cap -> alphas
    b2 = cap_boundary_fn(0, cap_height, True, nc)
    sponge, _, alphas, cap_z = b2(
        sponge, no_pend,
        replicate(partial_products_zs_commitment.merkle_tree.cap_dev))

    with timing.scope("quotient polys"):
        quotient_chunks = _compute_quotient_polys(
            prover_data, common, prover_data.constants_sigmas_commitment,
            wires_commitment, partial_products_zs_commitment,
            public_inputs_hash, betas, gammas, alphas,
            deltas=draws1 if has_lookup else ())

    with timing.scope("quotient commitment"):
        quotient_polys_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, zk and pcfg.QUOTIENT.blinding,
            cap_height, hasher=hasher)

    # boundary 3: absorb quotient cap -> zeta
    b3 = cap_boundary_fn(0, cap_height, True, 2)
    sponge, _, zdraw, cap_q = b3(
        sponge, no_pend,
        replicate(quotient_polys_commitment.merkle_tree.cap_dev))

    n_cs = int(prover_data.constants_sigmas_commitment.polynomials.shape[0])
    n_w = int(wires_commitment.polynomials.shape[0])
    n_z = int(partial_products_zs_commitment.polynomials.shape[0])
    n_q = int(quotient_polys_commitment.polynomials.shape[0])
    n_zpp = common.num_zs_partial_products_polys()
    with timing.scope("openings + final poly"):
        fn = _openings_final_fn(n_cs, n_w, n_z, n_q, nc, common.degree_bits,
                                rate_bits, n_zpp)
        packed, zz, f0, f1, sponge = fn(
            sponge, zdraw,
            shard_lanes(prover_data.constants_sigmas_commitment.polynomials),
            shard_lanes(wires_commitment.polynomials),
            shard_lanes(partial_products_zs_commitment.polynomials),
            shard_lanes(quotient_polys_commitment.polynomials))

    total = n_cs + n_w + 2 * n_z + n_q
    extra = jnp.concatenate([
        jnp.ravel(cap_w), jnp.ravel(cap_z), jnp.ravel(cap_q),
        jnp.ravel(packed), zz])

    with timing.scope("FRI opening proof" if not defer else "FRI dispatch"):
        fri_out = _fri_proof_fused(
            [prover_data.constants_sigmas_commitment.merkle_tree,
             wires_commitment.merkle_tree,
             partial_products_zs_commitment.merkle_tree,
             quotient_polys_commitment.merkle_tree],
            (f0, f1), None, common.fri_params,
            device_state=(sponge, []), extra_payload=extra, timing=timing,
            defer=defer)

    def finish() -> ProofWithPublicInputs:
        opening_proof, extra_host = fri_out() if defer else fri_out

        # -- parse the payload (the proof's host-side pieces) ----------------
        flat = extra_host
        caps = []
        pos = 0
        for _ in range(3):
            caps.append([[int(v) for v in flat[pos + r * 4:pos + (r + 1) * 4]]
                         for r in range(C)])
            pos += C * 4
        packed_h = flat[pos:pos + 2 * total].reshape(2, total)
        pos += 2 * total
        zz_h = [int(v) for v in flat[pos:pos + 4]]
        zeta = (zz_h[0], zz_h[1])
        # reference plonk/prover.rs:306-314 checks before openings; the result
        # is transcript-deterministic so checking after the fetch is equivalent
        if fs.ext_exp(zeta, degree) == fs.ext_one(2):
            raise ValueError("Opening point is in the subgroup.")

        off = np.cumsum([0, n_cs, n_w, n_z, n_z])
        segs = [[(int(a), int(b))
                 for a, b in zip(packed_h[0, s:e], packed_h[1, s:e])]
                for s, e in zip(off, list(off[1:]) + [total])]
        cs_eval, wires_eval, zs_pp_eval, zs_pp_next_eval, quot_eval = segs
        openings = OpeningSet(
            constants=[cs_eval[i] for i in common.constants_range()],
            plonk_sigmas=[cs_eval[i] for i in common.sigmas_range()],
            wires=wires_eval,
            plonk_zs=[zs_pp_eval[i] for i in common.zs_range()],
            plonk_zs_next=[zs_pp_next_eval[i] for i in common.zs_range()],
            partial_products=[zs_pp_eval[i]
                              for i in common.partial_products_range()],
            quotient_polys=quot_eval,
            lookup_zs=[zs_pp_eval[i] for i in common.lookup_range()],
            lookup_zs_next=[zs_pp_next_eval[i] for i in common.lookup_range()],
        )

        proof = Proof(
            wires_cap=caps[0],
            plonk_zs_partial_products_cap=caps[1],
            quotient_polys_cap=caps[2],
            openings=openings,
            opening_proof=opening_proof,
        )
        return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)

    if defer:
        return finish
    return finish()


def prove_many(prover_data, common, inputs_list, timing: TimingTree | None = None,
               window: int = 3, threads: int = 2) -> list[ProofWithPublicInputs]:
    """Batched/pipelined throughput proving: prove many witnesses of ONE
    circuit, overlapping host witness generation, host<->device transfers
    and device compute across proofs — the TPU dual of the reference's
    whole-machine rayon parallelism over independent proofs
    (maybe_rayon/src/lib.rs:31-289; protocol analog
    examples/bench_recursion.rs:294-349 at --threads N).

    Two composable mechanisms:
      * deferred fetches (always): each proof's device chain is dispatched
        without blocking; the single device->host fetch + parse happen
        later, so the device queue stays full (`window` bounds in-flight
        proofs — each middle-layer proof holds ~100 MB of oracle LDEs).
      * dispatch threads (threads >= 2): the axon tunnel overlaps
        transfers/executions issued from different host threads, which a
        single dispatch stream serializes (measured: 5.1 -> 7.3 proofs/s
        at the bench middle layer). The witness phase — where ALL of a
        non-zk proof's rng draws happen — still runs on the caller thread
        in proof order, so proofs stay byte-identical to sequential
        `prove` calls. zk circuits draw oracle salts during the device
        phase, so threaded mode would reorder their rng stream; they fall
        back to the single-stream pipeline (same proofs, reproducible).

    Byte-identity vs sequential proves is asserted by
    tests/test_prove_many.py for both modes."""
    timing = timing or TimingTree("prove_many")
    zk = common.config.zero_knowledge
    if threads >= 2 and not zk:
        from concurrent.futures import ThreadPoolExecutor

        out: list = [None] * len(inputs_list)
        done = 0
        with ThreadPoolExecutor(max_workers=threads) as pool:
            futures = []
            for inputs in inputs_list:
                # witness + rng on THIS thread, in proof order
                prepared = prepare_witness(prover_data, common, inputs)
                futures.append(pool.submit(
                    prove, prover_data, common, None, _prepared=prepared))
                while len(futures) > window:
                    out[done] = futures.pop(0).result()
                    done += 1
            for f in futures:
                out[done] = f.result()
                done += 1
        return out

    out = []
    pending: list = []
    for i, inputs in enumerate(inputs_list):
        with timing.scope(f"dispatch proof {i}"):
            pending.append(prove(prover_data, common, inputs, _defer=True))
        while len(pending) >= window:
            with timing.scope(f"finish proof {len(out)}"):
                out.append(pending.pop(0)())
    while pending:
        with timing.scope(f"finish proof {len(out)}"):
            out.append(pending.pop(0)())
    return out
