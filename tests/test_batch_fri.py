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
