"""Batch FRI: commit polynomials of MULTIPLE degrees in one argument
(reference batch_fri/{oracle,prover,verifier}.rs + hash/batch_merkle_tree.rs).

Same-degree polys are grouped, LDE'd and committed in one BatchMerkleTree;
the commit phase folds the tallest codeword and absorbs the next group when
the degrees align. Powers multi-degree STARK batching.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import ntt
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.proof import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
)
from plonky2_tpu.fri.prover import _fold_step_leaves, fri_proof_of_work
from plonky2_tpu.util.export_cache import persistent_jit
from plonky2_tpu.fri.verifier import (
    PrecomputedReducedOpenings,
    compute_evaluation,
    verify_proof_of_work,
)
from plonky2_tpu.hash.merkle import (
    BatchMerkleTree,
    MerkleTree,
    verify_batch_merkle_proof_to_cap,
    verify_merkle_proof_to_cap,
)
from plonky2_tpu.util import ReducingFactor, log2_strict, reverse_bits


class BatchFriOracle:
    """Polynomials of several degrees committed under one batch Merkle cap
    (reference batch_fri/oracle.rs:30-123)."""

    def __init__(self, poly_groups: list, rate_bits: int, cap_height: int):
        """poly_groups: list of [num_polys, n_k] coefficient arrays with
        strictly decreasing n_k."""
        self.polynomial_groups = [
            jnp.asarray(np.asarray(p, dtype=np.uint64)) for p in poly_groups
        ]
        self.degree_bits = [int(p.shape[-1]).bit_length() - 1 for p in poly_groups]
        assert all(self.degree_bits[i] > self.degree_bits[i + 1]
                   for i in range(len(poly_groups) - 1))
        self.rate_bits = rate_bits
        leaves = []
        for coeffs in self.polynomial_groups:
            lde = ntt.coset_lde(coeffs, rate_bits)  # [J, N_k]
            lg = int(lde.shape[-1]).bit_length() - 1
            rows = jnp.swapaxes(lde, 0, 1)
            rows = jnp.take(rows, jnp.asarray(ntt.bit_reverse_perm(lg)), axis=0)
            leaves.append(rows)
        self.batch_merkle_tree = BatchMerkleTree(leaves, cap_height)

    @staticmethod
    def from_values(value_groups: list, rate_bits: int, cap_height: int):
        coeff_groups = [ntt.ifft(jnp.asarray(np.asarray(v, dtype=np.uint64)))
                        for v in value_groups]
        return BatchFriOracle(coeff_groups, rate_bits, cap_height)


@functools.lru_cache(maxsize=None)
def _fused_batch_commit_fn(lens, arities, rate_bits, shifts, cap_height,
                           k_pending, pow_bits, num_queries):
    """ONE jit for the entire batch-FRI transcript after the composition
    polynomials: per-group initial LDEs, every fold step (leaves -> Merkle
    layers -> cap observe -> beta -> fold -> re-FFT, absorbing the next
    degree group when the codeword reaches its size — reference
    batch_fri/prover.rs:25-148), final-poly observation, the PoW grind, the
    PoW response draw, and the query-index draws, with the Fiat-Shamir
    challenger device-resident. The host path paid one cap fetch + one beta
    round trip per fold step; here the commit transcript is one dispatch
    and one packed fetch (the query gathers follow as batched opens).

    lens: per-group coefficient lengths (strictly decreasing);
    shifts: per-step coset shift after folding (g^(prod arities so far))."""
    from plonky2_tpu.fri.prover import _GRIND_CHUNK, _grind_candidates
    from plonky2_tpu.hash.merkle import merkle_layers_dev
    from plonky2_tpu.iop.challenger import DeviceChallenger

    n_lde0 = lens[0] << rate_bits
    final_len = n_lde0 >> sum(arities)
    keep = final_len >> rate_bits

    # static absorption schedule (mirrors the host loop's size comparison)
    absorb = []
    cur = n_lde0
    gi = 1
    for ab in arities:
        cur >>= ab
        hit = gi < len(lens) and cur == (lens[gi] << rate_bits)
        absorb.append(hit)
        if hit:
            gi += 1
    assert gi == len(lens), "arity schedule never reaches some degree group"

    def f(sponge, pending, *group_coeffs):
        dc = DeviceChallenger(sponge, [pending[i] for i in range(k_pending)])
        shift0 = fs.MULTIPLICATIVE_GROUP_GENERATOR
        vals_groups = [
            (ntt.lde_fft(group_coeffs[2 * k], rate_bits, shift=shift0),
             ntt.lde_fft(group_coeffs[2 * k + 1], rate_bits, shift=shift0))
            for k in range(len(lens))
        ]
        values = vals_groups[0]
        pad = n_lde0 - lens[0]
        z = jnp.zeros((pad,), dtype=jnp.uint64)
        coeffs = (jnp.concatenate([group_coeffs[0], z]),
                  jnp.concatenate([group_coeffs[1], z]))

        step_arrays = []
        caps = []
        lg_len = n_lde0.bit_length() - 1
        g_index = 1
        for i, ab in enumerate(arities):
            from plonky2_tpu.fri.prover import _fold_step_leaves_impl

            leaves = _fold_step_leaves_impl(values, ab, lg_len)
            layers = merkle_layers_dev(leaves, cap_height)
            caps.append(layers[-1])
            dc.observe_cap_rows(layers[-1])
            b0 = dc.get_challenge()
            b1 = dc.get_challenge()
            arity = 1 << ab
            c0, c1 = coeffs
            m = c0.shape[0] // arity
            c0r, c1r = c0.reshape(m, arity), c1.reshape(m, arity)
            acc = (c0r[:, arity - 1], c1r[:, arity - 1])
            for j in range(arity - 2, -1, -1):
                acc = g.ext2_add(g.ext2_mul(acc, (b0, b1)),
                                 (c0r[:, j], c1r[:, j]))
            coeffs = acc
            values = (ntt.coset_fft(coeffs[0], shift=shifts[i]),
                      ntt.coset_fft(coeffs[1], shift=shifts[i]))
            if absorb[i]:
                nxt = vals_groups[g_index]
                g_index += 1
                values = g.ext2_add(g.ext2_mul(values, (b0, b1)), nxt)
                coeffs = (ntt.coset_ifft(values[0], shift=shifts[i]),
                          ntt.coset_ifft(values[1], shift=shifts[i]))
            lg_len -= ab
            step_arrays.append((leaves, tuple(layers)))

        for i in range(keep):
            dc.observe_element(coeffs[0][i])
            dc.observe_element(coeffs[1][i])

        # PoW grind (reference fri/prover.rs:152-202; deterministic lowest
        # valid witness, identical to the host chunk scan)
        k = len(dc.inputs)
        inter = (jnp.concatenate([jnp.stack(dc.inputs), dc.state[k:]])
                 if dc.inputs else dc.state)

        def cond(carry):
            return carry[1] == 0

        def body(carry):
            start, _, _ = carry
            found, wit = _grind_candidates(inter, k, start, pow_bits)
            return (start + jnp.uint64(_GRIND_CHUNK), found, wit)

        _, _, witness = jax.lax.while_loop(
            cond, body, (jnp.uint64(0), jnp.uint64(0), jnp.uint64(0)))
        dc.observe_element(witness)
        pow_response = dc.get_challenge()

        idxs = jnp.stack([dc.get_challenge() for _ in range(num_queries)])
        idxs = idxs & jnp.uint64(n_lde0 - 1)

        packed = jnp.concatenate(
            [jnp.ravel(c) for c in caps]
            + [coeffs[0][:keep], coeffs[1][:keep],
               witness[None], pow_response[None], idxs, dc.state])
        return step_arrays, packed

    pj = persistent_jit(f, name="fri.batch_fri.fused_commit_pow")
    key = repr((lens, arities, rate_bits, shifts, cap_height, k_pending,
                pow_bits, num_queries))
    return (lambda *a: pj(*a, _pj_key=key)), keep


def _batch_fri_proof_fused(batch_trees, composition_coeffs, challenger,
                           fri_params) -> FriProof:
    """Fused-transcript batch FRI: commit folds + group absorption +
    final-poly observation + PoW + query draws in one device program;
    byte-identical proofs to the host loop (asserted by
    tests/test_batch_fri.py::test_batch_fri_fused_byte_identity)."""
    from plonky2_tpu.fri.prover import _sim_remaining_outputs
    from plonky2_tpu.hash.merkle import merkle_tree_from_device

    rate_bits = fri_params.config.rate_bits
    cap_height = fri_params.config.cap_height
    num_queries = fri_params.config.num_query_rounds
    arities = tuple(fri_params.reduction_arity_bits)
    lens = tuple(int(c0.shape[0]) for c0, _ in composition_coeffs)
    n = lens[0] << rate_bits

    shift = fs.MULTIPLICATIVE_GROUP_GENERATOR
    shifts = []
    for ab in arities:
        shift = fs.exp(shift, 1 << ab)
        shifts.append(shift)

    pending = challenger.input_buffer
    k_pending = len(pending)
    fn, keep = _fused_batch_commit_fn(
        lens, arities, rate_bits, tuple(shifts), cap_height, k_pending,
        fri_params.config.proof_of_work_bits, num_queries)
    sponge = jnp.asarray(np.asarray(challenger.sponge_state, dtype=np.uint64))
    pend = jnp.asarray(np.asarray(pending, dtype=np.uint64))
    flat_args = [a for c0, c1 in composition_coeffs for a in (c0, c1)]
    step_arrays, packed = fn(sponge, pend, *flat_args)

    flat = np.asarray(packed)  # ONE fetch: caps + final + pow + idx + sponge
    rows = 1 << cap_height
    pos = 0
    trees = []
    for leaves, layers in step_arrays:
        cap_host = [[int(v) for v in flat[pos + r * 4:pos + (r + 1) * 4]]
                    for r in range(rows)]
        pos += rows * 4
        trees.append(merkle_tree_from_device(leaves, layers, cap_height,
                                             cap_host))
    final_poly = [(int(a), int(b_)) for a, b_ in
                  zip(flat[pos:pos + keep], flat[pos + keep:pos + 2 * keep])]
    pos += 2 * keep
    pow_witness = int(flat[pos])
    pow_response = int(flat[pos + 1])
    pos += 2
    assert pow_response < (1 << (64 - fri_params.config.proof_of_work_bits))
    indices = [int(v) for v in flat[pos:pos + num_queries]]
    pos += num_queries
    sponge_out = flat[pos:pos + 12]

    # sync the host challenger to the device transcript (same duplex
    # schedule simulation as the single-degree fused path)
    m = _sim_remaining_outputs(k_pending, arities, rows, keep, num_queries)
    challenger.sponge_state = [int(x) for x in sponge_out]
    challenger.input_buffer = []
    challenger.output_buffer = [int(x) for x in sponge_out[:m]]

    rounds = _batch_query_rounds(batch_trees, trees, indices, fri_params)
    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


def _batch_query_rounds(batch_trees, trees, indices, fri_params):
    """Query-round extraction shared by the host and fused paths: one
    batched gather pass per tree for ALL query rounds."""
    initial_opens = [t.open_batch_many(indices) for t in batch_trees]
    step_opens = []
    xs = indices
    for i, tree in enumerate(trees):
        xs = [x >> fri_params.reduction_arity_bits[i] for x in xs]
        open_many = getattr(tree, "open_many", None)
        step_opens.append(open_many(xs) if open_many is not None
                          else [(tree.leaf(x), tree.prove(x)) for x in xs])
    rounds = []
    for qi in range(len(indices)):
        initial = FriInitialTreeProof(
            evals_proofs=[opens[qi] for opens in initial_opens])
        steps = []
        for i in range(len(trees)):
            flat, proof = step_opens[i][qi]
            steps.append(FriQueryStep(
                evals=[(flat[2 * k], flat[2 * k + 1])
                       for k in range(len(flat) // 2)],
                merkle_proof=proof,
            ))
        rounds.append(FriQueryRound(initial_trees_proof=initial, steps=steps))
    return rounds


def batch_fri_proof(batch_trees: list, composition_coeffs: list, challenger,
                    fri_params, hasher=None) -> FriProof:
    """composition_coeffs: per degree group, ext coeff pair (c0, c1) of the
    alpha-combined quotient polynomial (largest degree first), each of length
    2^degree_bits_k * 2^rate_bits after LDE below
    (reference batch_fri/prover.rs:25-148)."""
    from plonky2_tpu.fri import prover as fri_prover
    from plonky2_tpu.hash.hashers import PoseidonHasher

    algebraic = (hasher is None or hasher is PoseidonHasher
                 or getattr(hasher, "algebraic", False))
    if (not fri_prover._FORCE_HOST and algebraic
            and challenger.hasher is PoseidonHasher
            and tuple(fri_params.reduction_arity_bits)):
        # path-matrix introspection (tests/test_fri_path_matrix.py)
        fri_prover._LAST_PATH = "batch_fused"
        coeffs_dev = [
            (jnp.asarray(np.asarray(c0, dtype=np.uint64)),
             jnp.asarray(np.asarray(c1, dtype=np.uint64)))
            for c0, c1 in composition_coeffs
        ]
        return _batch_fri_proof_fused(batch_trees, coeffs_dev, challenger,
                                      fri_params)

    fri_prover._LAST_PATH = "batch_host"
    rate_bits = fri_params.config.rate_bits
    cap_height = fri_params.config.cap_height
    shift = fs.MULTIPLICATIVE_GROUP_GENERATOR

    # LDE each group's composition polynomial
    values_per_group = []
    for c0, c1 in composition_coeffs:
        values_per_group.append((
            ntt.lde_fft(c0, rate_bits, shift=shift),
            ntt.lde_fft(c1, rate_bits, shift=shift),
        ))

    # fold operates on the LDE-PADDED coefficient vector (reference lde()
    # zero-pad, batch_fri/oracle.rs:171)
    values = values_per_group[0]
    n = int(values[0].shape[0])
    c0, c1 = composition_coeffs[0]
    pad = n - int(c0.shape[0])
    z = jnp.zeros((pad,), dtype=jnp.uint64)
    coeffs = (jnp.concatenate([c0, z]), jnp.concatenate([c1, z]))

    trees = []
    poly_index = 1
    cur_shift = shift
    for arity_bits in fri_params.reduction_arity_bits:
        lg_len = int(values[0].shape[0]).bit_length() - 1
        leaves = _fold_step_leaves(values, arity_bits, lg_len)
        tree = MerkleTree(leaves, cap_height)
        trees.append(tree)
        challenger.observe_cap(tree.cap)
        beta = challenger.get_extension_challenge(2)
        b = g.to_field(list(beta))

        # fold coefficients by beta per arity chunk
        arity = 1 << arity_bits
        c0, c1 = coeffs
        m = c0.shape[0] // arity
        c0r, c1r = c0.reshape(m, arity), c1.reshape(m, arity)
        acc = (c0r[:, arity - 1], c1r[:, arity - 1])
        bb = (b[0], b[1])
        for j in range(arity - 2, -1, -1):
            acc = g.ext2_add(g.ext2_mul(acc, bb), (c0r[:, j], c1r[:, j]))
        coeffs = acc
        cur_shift = fs.exp(cur_shift, arity)
        values = (ntt.coset_fft(coeffs[0], shift=cur_shift),
                  ntt.coset_fft(coeffs[1], shift=cur_shift))
        if poly_index < len(values_per_group) and \
                int(values[0].shape[0]) == int(values_per_group[poly_index][0].shape[0]):
            nxt = values_per_group[poly_index]
            values = g.ext2_add(g.ext2_mul(values, bb), nxt)
            coeffs = (ntt.coset_ifft(values[0], shift=cur_shift),
                      ntt.coset_ifft(values[1], shift=cur_shift))
            poly_index += 1
    assert poly_index == len(values_per_group)

    c0, c1 = np.asarray(coeffs[0]), np.asarray(coeffs[1])
    keep = len(c0) >> rate_bits
    final_poly = [(int(a), int(b_)) for a, b_ in zip(c0[:keep], c1[:keep])]
    assert all(int(a) == 0 and int(b_) == 0 for a, b_ in zip(c0[keep:], c1[keep:]))
    for coeff in final_poly:
        challenger.observe_extension_element(coeff)

    pow_witness = fri_proof_of_work(challenger, fri_params.config)

    indices = [c % n for c in challenger.get_n_challenges(fri_params.config.num_query_rounds)]
    # Batched extraction: one gather pass per tree for ALL query rounds
    # (mirrors fri/prover.py; per-index walks cost a tunnel RTT per access).
    rounds = _batch_query_rounds(batch_trees, trees, indices, fri_params)

    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=rounds,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


def _batch_combine_initial(instances, index, initial_proof, alpha, subgroup_x,
                           precomputed, params):
    alpha_rf = ReducingFactor(alpha)
    total = fs.ext_zero(2)
    sx = fs.ext_from_base(subgroup_x, 2)
    for batch, reduced_openings in zip(
        instances[index].batches, precomputed.reduced_openings_at_point
    ):
        evals = [
            initial_proof.unsalted_eval(p.oracle_index, p.polynomial_index, False)
            for p in batch.polynomials
        ]
        reduced_evals = alpha_rf.reduce(evals)
        numerator = fs.ext_sub(reduced_evals, reduced_openings)
        denominator = fs.ext_sub(sx, batch.point)
        total = alpha_rf.shift(total)
        total = fs.ext_add(total, fs.ext_div(numerator, denominator))
    return total


def verify_batch_fri_proof(degree_bits: list[int], instances, openings,
                           challenges, initial_merkle_caps, leaf_heights_per_oracle,
                           proof: FriProof, params, hasher=None) -> None:
    """reference batch_fri/verifier.rs:23-250. leaf_heights_per_oracle: per
    initial oracle, the BatchMerkleTree leaf heights (lde sizes, bits)."""
    verify_proof_of_work(challenges.fri_pow_response, params.config)
    assert params.config.num_query_rounds == len(proof.query_round_proofs)

    precomputed = [
        PrecomputedReducedOpenings(o, challenges.fri_alpha) for o in openings
    ]
    lde_bits = [d + params.config.rate_bits for d in degree_bits]

    for x_index, round_proof in zip(challenges.fri_query_indices,
                                    proof.query_round_proofs):
        # initial batch Merkle proofs
        for oracle_index, ((evals, merkle_proof), cap) in enumerate(
            zip(round_proof.initial_trees_proof.evals_proofs, initial_merkle_caps)
        ):
            # split concatenated evals back into per-instance leaf rows
            leaves = []
            pos = 0
            for inst in instances:
                k = inst.oracles[oracle_index].num_polys
                leaves.append(evals[pos:pos + k])
                pos += k
            verify_batch_merkle_proof_to_cap(
                leaves, leaf_heights_per_oracle[oracle_index], x_index, cap,
                merkle_proof, hasher,
            )

        n_bits = lde_bits[0]
        subgroup_x = fs.mul(
            fs.MULTIPLICATIVE_GROUP_GENERATOR,
            fs.exp(fs.primitive_root_of_unity(n_bits), reverse_bits(x_index, n_bits)),
        )
        batch_index = 0
        # per-instance evals are concatenated in the initial proof; rebuild a
        # view offsetting polynomial indices for instance `batch_index`
        offsets = []
        acc = [0] * len(initial_merkle_caps)
        for inst in instances:
            offsets.append(list(acc))
            for oi, o in enumerate(inst.oracles):
                acc[oi] += o.num_polys

        def shifted_proof(bi):
            class _View:
                def unsalted_eval(self, oracle_index, poly_index, salted):
                    evals = round_proof.initial_trees_proof.evals_proofs[oracle_index][0]
                    return evals[offsets[bi][oracle_index] + poly_index]

            return _View()

        old_eval = _batch_combine_initial(
            instances, 0, shifted_proof(0), challenges.fri_alpha, subgroup_x,
            precomputed[0], params,
        )
        batch_index = 1

        xi = x_index
        for i, ab in enumerate(params.reduction_arity_bits):
            arity = 1 << ab
            evals = proof.query_round_proofs and round_proof.steps[i].evals
            coset_index = xi >> ab
            within = xi & (arity - 1)
            if evals[within] != old_eval:
                raise ValueError(f"Batch FRI fold consistency failed at step {i}")
            old_eval = compute_evaluation(
                subgroup_x, within, ab, evals, challenges.fri_betas[i]
            )
            flat = [c for e in evals for c in e]
            verify_merkle_proof_to_cap(
                flat, coset_index, proof.commit_phase_merkle_caps[i],
                round_proof.steps[i].merkle_proof, hasher,
            )
            subgroup_x = fs.exp(subgroup_x, arity)
            xi = coset_index
            n_bits -= ab

            if batch_index < len(lde_bits) and n_bits == lde_bits[batch_index]:
                subgroup_x_init = fs.mul(
                    fs.MULTIPLICATIVE_GROUP_GENERATOR,
                    fs.exp(fs.primitive_root_of_unity(n_bits), reverse_bits(xi, n_bits)),
                )
                eval2 = _batch_combine_initial(
                    instances, batch_index, shifted_proof(batch_index),
                    challenges.fri_alpha, subgroup_x_init,
                    precomputed[batch_index], params,
                )
                old_eval = fs.ext_add(
                    fs.ext_mul(old_eval, challenges.fri_betas[i]), eval2
                )
                batch_index += 1

        assert batch_index == len(instances), "Wrong number of folded instances."
        sx = fs.ext_from_base(subgroup_x, 2)
        final_eval = fs.ext_zero(2)
        for coeff in reversed(proof.final_poly):
            final_eval = fs.ext_add(fs.ext_mul(final_eval, sx), coeff)
        if final_eval != old_eval:
            raise ValueError("Batch FRI final polynomial evaluation is invalid.")


# -- in-circuit batch FRI verification ----------------------------------------


def verify_batch_fri_proof_circuit(builder, degree_bits: list[int], instances,
                                   openings_t_list, challenges_t,
                                   initial_merkle_caps_t,
                                   leaf_heights_per_oracle, proof_t,
                                   params) -> None:
    """Circuit dual of verify_batch_fri_proof
    (reference batch_fri/recursive_verifier.rs:22-332): batch-Merkle initial
    proofs, and smaller-degree instances absorbed into the running fold when
    the codeword reaches their size."""
    from plonky2_tpu.field import scalar as _fs
    from plonky2_tpu.fri.recursive_verifier import (
        PrecomputedReducedOpeningsTarget,
        compute_evaluation as compute_evaluation_t,
        fri_combine_initial,
        fri_verify_proof_of_work,
    )

    assert params.final_poly_len() == len(proof_t.final_poly)
    fri_verify_proof_of_work(builder, challenges_t.fri_pow_response, params.config)
    assert params.config.num_query_rounds == len(proof_t.query_round_proofs)

    precomputed = [
        PrecomputedReducedOpeningsTarget(o, challenges_t.fri_alpha, builder)
        for o in openings_t_list
    ]
    lde_bits = [d + params.config.rate_bits for d in degree_bits]

    # per-instance polynomial-index offsets into the concatenated leaf rows
    offsets = []
    acc = [0] * len(initial_merkle_caps_t)
    for inst in instances:
        offsets.append(list(acc))
        for oi, o in enumerate(inst.oracles):
            acc[oi] += o.num_polys

    g_const = builder.constant(_fs.MULTIPLICATIVE_GROUP_GENERATOR)

    for qi, round_proof in enumerate(proof_t.query_round_proofs):
        x_index = challenges_t.fri_query_indices[qi]
        n_bits = lde_bits[0]
        x_index_bits = builder.low_bits(x_index, n_bits, 64)
        cap_index = builder.le_sum(
            x_index_bits[n_bits - params.config.cap_height:])

        for oi, ((evals, merkle_proof), cap) in enumerate(zip(
            round_proof.initial_trees_proof.evals_proofs, initial_merkle_caps_t
        )):
            leaves = []
            pos = 0
            for inst in instances:
                k = inst.oracles[oi].num_polys
                leaves.append(list(evals[pos:pos + k]))
                pos += k
            builder.verify_batch_merkle_proof_to_cap_with_cap_index(
                leaves, leaf_heights_per_oracle[oi], x_index_bits, cap_index,
                cap, merkle_proof,
            )

        def _view(bi):
            class _V:
                def unsalted_eval(self, oracle_index, poly_index, salted):
                    evals = round_proof.initial_trees_proof.evals_proofs[oracle_index][0]
                    return evals[offsets[bi][oracle_index] + poly_index]

            return _V()

        phi = _fs.primitive_root_of_unity(n_bits)
        phi_pow = builder.exp_from_bits_const_base(phi, list(reversed(x_index_bits)))
        subgroup_x = builder.mul(g_const, phi_pow)

        old_eval = fri_combine_initial(
            builder, instances[0], _view(0), challenges_t.fri_alpha, subgroup_x,
            precomputed[0], params,
        )
        batch_index = 1

        n = n_bits
        for i, arity_bits in enumerate(params.reduction_arity_bits):
            evals = round_proof.steps[i].evals
            coset_index_bits = x_index_bits[arity_bits:]
            within_bits = x_index_bits[:arity_bits]
            within = builder.le_sum(within_bits)

            new_eval = builder.random_access_extension(within, list(evals))
            builder.connect_extension(new_eval, old_eval)

            old_eval = compute_evaluation_t(
                builder, subgroup_x, within_bits, arity_bits, evals,
                challenges_t.fri_betas[i],
            )
            flat = [c for e in evals for c in e.parts]
            builder.verify_merkle_proof_to_cap_with_cap_index(
                flat, coset_index_bits, cap_index,
                proof_t.commit_phase_merkle_caps[i],
                round_proof.steps[i].merkle_proof,
            )
            subgroup_x = builder.exp_power_of_2(subgroup_x, arity_bits)
            x_index_bits = coset_index_bits
            n -= arity_bits

            if batch_index < len(lde_bits) and n == lde_bits[batch_index]:
                phi = _fs.primitive_root_of_unity(n)
                phi_pow = builder.exp_from_bits_const_base(
                    phi, list(reversed(x_index_bits)))
                subgroup_x_init = builder.mul(g_const, phi_pow)
                ev = fri_combine_initial(
                    builder, instances[batch_index], _view(batch_index),
                    challenges_t.fri_alpha, subgroup_x_init,
                    precomputed[batch_index], params,
                )
                old_eval = builder.mul_extension(old_eval, challenges_t.fri_betas[i])
                old_eval = builder.add_extension(old_eval, ev)
                batch_index += 1

        assert batch_index == len(instances), "Wrong number of folded instances."
        acc_ev = builder.zero_extension()
        for coeff in reversed(proof_t.final_poly):
            acc_ev = builder.scalar_mul_add_extension(subgroup_x, acc_ev, coeff)
        builder.connect_extension(acc_ev, old_eval)
