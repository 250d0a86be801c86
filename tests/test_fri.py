"""End-to-end FRI: commit a batch of polynomials, open at two points,
produce a FRI proof on the (virtual) device, verify with the host verifier.

This exercises oracle LDE/Merkle, the alpha-reduction/quotient path, the
commit-phase fold, PoW grind, query rounds, and bit-exact transcript replay
between prover and verifier challengers.
"""

import random

import numpy as np
import pytest

from plonky2_tpu.field import scalar as s
from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOpeningBatch,
    FriOpenings,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.fri import verifier as fv
from plonky2_tpu.iop.challenger import Challenger


def eval_ext(coeffs_row, z):
    acc = s.ext_zero(2)
    for c in reversed(coeffs_row):
        acc = s.ext_add(s.ext_mul(acc, z), s.ext_from_base(int(c), 2))
    return acc


@pytest.mark.parametrize("strategy", [
    FriReductionStrategy.ConstantArityBits(2, 3),
    FriReductionStrategy.Fixed([2, 1]),
])
def test_fri_end_to_end(strategy):
    rng = random.Random(1234)
    num_polys, lg_n, rate_bits = 4, 6, 3
    n = 1 << lg_n
    config = FriConfig(
        rate_bits=rate_bits, cap_height=1, proof_of_work_bits=4,
        reduction_strategy=strategy, num_query_rounds=8,
    )
    params = config.fri_params(lg_n, hiding=False)

    values = [[rng.randrange(s.P) for _ in range(n)] for _ in range(num_polys)]
    oracle = PolynomialBatch.from_values(values, rate_bits, False, config.cap_height)

    coeffs_host = np.asarray(oracle.polynomials)

    # transcript: observe commitment, then openings, then run FRI
    ch = Challenger()
    ch.observe_cap(oracle.merkle_tree.cap)
    zeta = ch.get_extension_challenge(2)
    g_zeta = s.ext_scalar_mul(s.primitive_root_of_unity(lg_n), zeta)

    polys_info = FriPolynomialInfo.from_range(0, range(num_polys))
    instance = FriInstanceInfo(
        oracles=[FriOracleInfo(num_polys=num_polys, blinding=False)],
        batches=[FriBatchInfo(point=zeta, polynomials=polys_info),
                 FriBatchInfo(point=g_zeta, polynomials=polys_info)],
    )
    openings = FriOpenings(batches=[
        FriOpeningBatch(values=[eval_ext(coeffs_host[j], zeta) for j in range(num_polys)]),
        FriOpeningBatch(values=[eval_ext(coeffs_host[j], g_zeta) for j in range(num_polys)]),
    ])
    fv.observe_openings(ch, openings)

    proof = PolynomialBatch.prove_openings(instance, [oracle], ch, params)

    assert len(proof.final_poly) == params.final_poly_len()
    assert len(proof.query_round_proofs) == config.num_query_rounds

    # verifier: replay transcript from scratch
    vch = Challenger()
    vch.observe_cap(oracle.merkle_tree.cap)
    v_zeta = vch.get_extension_challenge(2)
    assert v_zeta == zeta
    fv.observe_openings(vch, openings)
    challenges = vch.fri_challenges = fv.fri_challenges(
        vch, proof.commit_phase_merkle_caps, proof.final_poly, proof.pow_witness,
        lg_n, config,
    )
    fv.verify_fri_proof(
        instance, openings, challenges, [oracle.merkle_tree.cap], proof, params
    )


def test_fri_rejects_tampering():
    rng = random.Random(99)
    num_polys, lg_n, rate_bits = 2, 5, 2
    n = 1 << lg_n
    config = FriConfig(
        rate_bits=rate_bits, cap_height=0, proof_of_work_bits=2,
        reduction_strategy=FriReductionStrategy.ConstantArityBits(1, 2),
        num_query_rounds=6,
    )
    params = config.fri_params(lg_n, hiding=False)
    values = [[rng.randrange(s.P) for _ in range(n)] for _ in range(num_polys)]
    oracle = PolynomialBatch.from_values(values, rate_bits, False, config.cap_height)
    coeffs_host = np.asarray(oracle.polynomials)

    ch = Challenger()
    ch.observe_cap(oracle.merkle_tree.cap)
    zeta = ch.get_extension_challenge(2)
    polys_info = FriPolynomialInfo.from_range(0, range(num_polys))
    instance = FriInstanceInfo(
        oracles=[FriOracleInfo(num_polys=num_polys, blinding=False)],
        batches=[FriBatchInfo(point=zeta, polynomials=polys_info)],
    )
    openings = FriOpenings(batches=[
        FriOpeningBatch(values=[eval_ext(coeffs_host[j], zeta) for j in range(num_polys)]),
    ])
    fv.observe_openings(ch, openings)
    proof = PolynomialBatch.prove_openings(instance, [oracle], ch, params)

    def replay(openings_, proof_):
        vch = Challenger()
        vch.observe_cap(oracle.merkle_tree.cap)
        vch.get_extension_challenge(2)
        fv.observe_openings(vch, openings_)
        challenges = fv.fri_challenges(
            vch, proof_.commit_phase_merkle_caps, proof_.final_poly,
            proof_.pow_witness, lg_n, config,
        )
        fv.verify_fri_proof(
            instance, openings_, challenges, [oracle.merkle_tree.cap], proof_, params
        )

    replay(openings, proof)  # sanity: untampered passes

    # tamper with an opening value
    bad = FriOpenings(batches=[FriOpeningBatch(values=list(openings.batches[0].values))])
    v0 = bad.batches[0].values[0]
    bad.batches[0].values[0] = (s.add(v0[0], 1), v0[1])
    with pytest.raises(ValueError):
        replay(bad, proof)

    # tamper with the final poly
    import copy

    bad_proof = copy.deepcopy(proof)
    c0 = bad_proof.final_poly[0]
    bad_proof.final_poly[0] = (s.add(c0[0], 1), c0[1])
    with pytest.raises(ValueError):
        replay(openings, bad_proof)


def test_natural_merkle_tree_matches_reference_order():
    """NaturalMerkleTree (no-transpose, halves-pairing commit layout) must
    present the exact reference-order cap/leaf/prove interface."""
    import numpy as np
    import jax.numpy as jnp
    from plonky2_tpu.field import scalar as fs
    from plonky2_tpu.hash.merkle import (
        MerkleTree, NaturalMerkleTree, verify_merkle_proof_to_cap)
    from plonky2_tpu.util import reverse_bits

    rng = np.random.default_rng(3)
    width, lg_n, cap_h = 7, 6, 2
    n = 1 << lg_n
    cols = rng.integers(0, fs.P, size=(width, n), dtype=np.uint64)
    ref_leaves = cols[:, [reverse_bits(i, lg_n) for i in range(n)]].T
    ref = MerkleTree(ref_leaves, cap_h)
    nat = NaturalMerkleTree(jnp.asarray(cols), cap_h)
    assert nat.cap == ref.cap
    for i in (0, 1, 13, n - 1):
        assert nat.leaf(i) == ref.leaf(i)
        assert nat.prove(i).siblings == ref.prove(i).siblings
        verify_merkle_proof_to_cap(nat.leaf(i), i, nat.cap, nat.prove(i))
