"""KeccakGoldilocksConfig variant (driver config 5): keccak transcript +
Merkle trees, Poseidon inner hasher — native verification only
(reference plonk/config.rs:118-126)."""

import pytest

from plonky2_tpu.hash.keccak import keccak256


def test_keccak256_kats():
    assert keccak256(b"").hex() == (
        "c5d2460186f7233c927e7db2dcc703c0e500b653ca82273b7bfad8045d85a470"
    )
    assert keccak256(b"abc").hex() == (
        "4e03657aea45a94fc7d47ba826c8d667c0d1e6e33a64a036ec44f58fa12d6c45"
    )


def test_keccak_merkle_tree():
    import numpy as np

    from plonky2_tpu.hash.hashers import KeccakHasher
    from plonky2_tpu.hash.merkle import KeccakMerkleTree, verify_merkle_proof_to_cap

    rng = np.random.default_rng(0)
    leaves = rng.integers(0, 1 << 63, size=(32, 7), dtype=np.uint64)
    tree = KeccakMerkleTree(leaves, cap_height=2)
    for idx in [0, 5, 31]:
        proof = tree.prove(idx)
        verify_merkle_proof_to_cap(tree.leaf(idx), idx, tree.cap, proof, KeccakHasher)
    with pytest.raises(ValueError):
        proof = tree.prove(0)
        verify_merkle_proof_to_cap(tree.leaf(1), 0, tree.cap, proof, KeccakHasher)


def test_factorial_keccak_config():
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig, keccak_goldilocks_config
    from plonky2_tpu.plonk.serialization import proof_from_bytes, proof_to_bytes

    builder = CircuitBuilder(
        CircuitConfig.standard_recursion_config(), gc=keccak_goldilocks_config()
    )
    initial = builder.add_virtual_target()
    cur = initial
    for i in range(2, 40):
        cur = builder.mul(cur, builder.constant(i))
    builder.register_public_input(initial)
    builder.register_public_input(cur)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial, 1)
    proof = data.prove(pw)
    data.verify(proof)

    blob = proof_to_bytes(proof)
    restored = proof_from_bytes(blob, data.common)
    data.verify(restored)
