"""Batch FRI: polynomials of multiple degrees committed and opened in one
argument (reference batch_fri/ + hash/batch_merkle_tree.rs)."""

import numpy as np
import pytest

from plonky2_tpu.field import ntt, scalar as fs
from plonky2_tpu.fri.batch_fri import BatchFriOracle, batch_fri_proof, verify_batch_fri_proof
from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.fri.oracle import _batch_quotient
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOpeningBatch,
    FriOpenings,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.fri.verifier import fri_challenges
from plonky2_tpu.hash.merkle import verify_batch_merkle_proof_to_cap
from plonky2_tpu.iop.challenger import Challenger
from plonky2_tpu.field import goldilocks as g


def test_batch_merkle_tree():
    rng = np.random.default_rng(1)
    mats = [
        rng.integers(0, 1 << 63, size=(64, 5), dtype=np.uint64),
        rng.integers(0, 1 << 63, size=(16, 7), dtype=np.uint64),
    ]
    from plonky2_tpu.hash.merkle import BatchMerkleTree

    t = BatchMerkleTree(mats, cap_height=2)
    for idx in [0, 3, 40, 63]:
        verify_batch_merkle_proof_to_cap(
            t.values(idx), t.leaf_heights, idx, t.cap, t.open_batch(idx)
        )
    with pytest.raises(ValueError):
        vals = t.values(0)
        vals[0] = [v + 1 for v in vals[0]]
        verify_batch_merkle_proof_to_cap(
            vals, t.leaf_heights, 0, t.cap, t.open_batch(0)
        )


def test_batch_fri_prove_verify():
    rng = np.random.default_rng(2)
    rate_bits, cap_height = 3, 2
    bits = [9, 7]
    groups = [
        rng.integers(0, fs.P, size=(3, 1 << bits[0]), dtype=np.uint64),
        rng.integers(0, fs.P, size=(2, 1 << bits[1]), dtype=np.uint64),
    ]
    oracle = BatchFriOracle(groups, rate_bits, cap_height)

    arities = (1,) * 4
    params = FriParams(
        config=FriConfig(rate_bits=rate_bits, cap_height=cap_height,
                         proof_of_work_bits=8,
                         reduction_strategy=FriReductionStrategy.Fixed(arities),
                         num_query_rounds=24),
        hiding=False, degree_bits=bits[0], reduction_arity_bits=arities,
    )

    # open group k's polynomials at a point z_k
    points = [(5, 7), (11, 13)]
    instances = [
        FriInstanceInfo(
            oracles=[FriOracleInfo(groups[k].shape[0], False)],
            batches=[FriBatchInfo(
                point=points[k],
                polynomials=FriPolynomialInfo.from_range(0, range(groups[k].shape[0])),
            )],
        )
        for k in range(2)
    ]

    def eval_at(coeffs, z):
        acc = fs.ext_zero(2)
        for c in reversed([int(v) for v in coeffs]):
            acc = fs.ext_add(fs.ext_mul(acc, z), fs.ext_from_base(c, 2))
        return acc

    openings = [
        FriOpenings(batches=[FriOpeningBatch(
            values=[eval_at(groups[k][j], points[k]) for j in range(groups[k].shape[0])]
        )])
        for k in range(2)
    ]

    # prover transcript
    challenger = Challenger()
    challenger.observe_cap(oracle.batch_merkle_tree.cap)
    alpha = challenger.get_extension_challenge(2)
    comps = []
    for k in range(2):
        import jax.numpy as jnp

        q0, q1 = _batch_quotient(
            jnp.asarray(groups[k]), g.to_field(list(alpha)),
            g.to_field(list(points[k])), rate_bits,
        )
        comps.append((q0, q1))
    proof = batch_fri_proof([oracle.batch_merkle_tree], comps, challenger, params)

    # verifier transcript replay
    v = Challenger()
    v.observe_cap(oracle.batch_merkle_tree.cap)
    challenges = fri_challenges(
        v, proof.commit_phase_merkle_caps, proof.final_poly, proof.pow_witness,
        params.degree_bits, params.config,
    )
    leaf_heights = [[b + rate_bits for b in bits]]
    verify_batch_fri_proof(
        bits, instances, openings, challenges,
        [oracle.batch_merkle_tree.cap], leaf_heights, proof, params,
    )

    # tampering is rejected
    bad = [list(o) for o in openings[0].batches[0].values]
    openings[0].batches[0].values[0] = (
        fs.add(openings[0].batches[0].values[0][0], 1),
        openings[0].batches[0].values[0][1],
    )
    with pytest.raises(Exception):
        verify_batch_fri_proof(
            bits, instances, openings, challenges,
            [oracle.batch_merkle_tree.cap], leaf_heights, proof, params,
        )


def test_batch_fri_recursive():
    """In-circuit batch FRI verification (reference
    batch_fri/recursive_verifier.rs): same two-group setup, verified inside a
    plonky2 circuit with an in-circuit transcript replay."""
    import jax.numpy as jnp

    from plonky2_tpu.fri.batch_fri import verify_batch_fri_proof_circuit
    from plonky2_tpu.fri.recursive_verifier import (
        FriChallengesTarget,
        add_virtual_cap,
        add_virtual_fri_proof,
        set_cap_target,
        set_fri_proof_target,
    )
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.recursion.recursive_challenger import RecursiveChallenger

    rng = np.random.default_rng(2)
    rate_bits, cap_height = 3, 2
    bits = [9, 7]
    groups = [
        rng.integers(0, fs.P, size=(3, 1 << bits[0]), dtype=np.uint64),
        rng.integers(0, fs.P, size=(2, 1 << bits[1]), dtype=np.uint64),
    ]
    oracle = BatchFriOracle(groups, rate_bits, cap_height)
    arities = (1,) * 4
    params = FriParams(
        config=FriConfig(rate_bits=rate_bits, cap_height=cap_height,
                         proof_of_work_bits=8,
                         reduction_strategy=FriReductionStrategy.Fixed(arities),
                         num_query_rounds=8),
        hiding=False, degree_bits=bits[0], reduction_arity_bits=arities,
    )
    points = [(5, 7), (11, 13)]

    def eval_at(coeffs, z):
        acc = fs.ext_zero(2)
        for c in reversed([int(v) for v in coeffs]):
            acc = fs.ext_add(fs.ext_mul(acc, z), fs.ext_from_base(c, 2))
        return acc

    challenger = Challenger()
    challenger.observe_cap(oracle.batch_merkle_tree.cap)
    alpha = challenger.get_extension_challenge(2)
    comps = []
    for k in range(2):
        q0, q1 = _batch_quotient(
            jnp.asarray(groups[k]), g.to_field(list(alpha)),
            g.to_field(list(points[k])), rate_bits,
        )
        comps.append((q0, q1))
    proof = batch_fri_proof([oracle.batch_merkle_tree], comps, challenger, params)

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    cap_t = add_virtual_cap(builder, cap_height)
    proof_t = add_virtual_fri_proof(builder, [sum(gr.shape[0] for gr in groups)],
                                    params)

    ch = RecursiveChallenger(builder)
    ch.observe_cap(cap_t)
    alpha_t = ch.get_extension_challenge()
    betas_t = []
    for cap in proof_t.commit_phase_merkle_caps:
        ch.observe_cap(cap)
        betas_t.append(ch.get_extension_challenge())
    ch.observe_extension_elements(proof_t.final_poly)
    ch.observe_element(proof_t.pow_witness)
    pow_response_t = ch.get_challenge()
    query_indices_t = ch.get_n_challenges(params.config.num_query_rounds)
    challenges_t = FriChallengesTarget(
        fri_alpha=alpha_t, fri_betas=betas_t,
        fri_pow_response=pow_response_t, fri_query_indices=query_indices_t,
    )

    instances_t = [
        FriInstanceInfo(
            oracles=[FriOracleInfo(groups[k].shape[0], False)],
            batches=[FriBatchInfo(
                point=builder.constant_extension(points[k]),
                polynomials=FriPolynomialInfo.from_range(0, range(groups[k].shape[0])),
            )],
        )
        for k in range(2)
    ]
    openings_t = [
        FriOpenings(batches=[FriOpeningBatch(values=[
            builder.constant_extension(eval_at(groups[k][j], points[k]))
            for j in range(groups[k].shape[0])
        ])])
        for k in range(2)
    ]
    verify_batch_fri_proof_circuit(
        builder, bits, instances_t, openings_t, challenges_t, [cap_t],
        [[b + rate_bits for b in bits]], proof_t, params,
    )
    data = builder.build()

    pw = PartialWitness()
    set_cap_target(pw, cap_t, oracle.batch_merkle_tree.cap)
    set_fri_proof_target(pw, proof_t, proof)
    zk_proof = data.prove(pw)
    data.verify(zk_proof)
