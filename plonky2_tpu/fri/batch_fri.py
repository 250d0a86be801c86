"""Batch FRI: commit polynomials of MULTIPLE degrees in one argument
(reference batch_fri/{oracle,prover,verifier}.rs + hash/batch_merkle_tree.rs).

Same-degree polys are grouped, LDE'd and committed in one BatchMerkleTree;
the commit phase folds the tallest codeword and absorbs the next group when
the degrees align. Powers multi-degree STARK batching.
"""

from __future__ import annotations

import numpy as np
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


def batch_fri_proof(batch_trees: list, composition_coeffs: list, challenger,
                    fri_params, hasher=None) -> FriProof:
    """composition_coeffs: per degree group, ext coeff pair (c0, c1) of the
    alpha-combined quotient polynomial (largest degree first), each of length
    2^degree_bits_k * 2^rate_bits after LDE below
    (reference batch_fri/prover.rs:25-148)."""
    from plonky2_tpu.fri import prover as fri_prover

    # path-matrix introspection (tests/test_fri_path_matrix.py): batch FRI
    # runs the host-transcript commit loop (the fold chain absorbs a new
    # degree group between steps, a structure the fused single-degree
    # program does not cover)
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
                evals=[(flat[2 * k], flat[2 * k + 1]) for k in range(len(flat) // 2)],
                merkle_proof=proof,
            ))
        rounds.append(FriQueryRound(initial_trees_proof=initial, steps=steps))

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
