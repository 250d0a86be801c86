"""Multi-device prover tests on the virtual 8-device CPU mesh.

These convert the multi-chip claim into fact: sharded execution must be
BIT-IDENTICAL to single-device execution (the reference's maybe_rayon
parallelism is semantics-free, maybe_rayon/src/lib.rs:31-289; ours must be
too). Covers the driver's dryrun path, non-divisible shapes (135 wire polys
on 8 devices), and a recursion-sized full prove.
"""

import numpy as np
import jax
import pytest

from plonky2_tpu.parallel import (
    make_mesh,
    pad_shard_polys,
    sharded_commit,
    use_mesh,
)


def _mesh():
    return make_mesh(len(jax.devices()))


def test_sharded_commit_matches_single_device():
    """(a) sharded_commit caps bit-identical to the unsharded pipeline."""
    from plonky2_tpu.fri.oracle import _values_to_lde_leaves
    from plonky2_tpu.hash.merkle import merkle_layers_dev

    rng = np.random.default_rng(7)
    values = rng.integers(0, (1 << 64) - (1 << 32), size=(8, 64), dtype=np.uint64)

    _, _, leaves_1dev = _values_to_lde_leaves(np.array(values), 3, 0)
    cap_1dev = np.asarray(merkle_layers_dev(leaves_1dev, 2)[-1])

    coeffs, leaves, cap = sharded_commit(values, 3, 2, _mesh())
    assert (np.asarray(cap) == cap_1dev).all()
    assert (np.asarray(leaves) == np.asarray(leaves_1dev)).all()


def test_pad_shard_polys_uneven():
    """(c) non-divisible poly counts: pad to a mesh multiple, results sliced
    back are bit-identical (135 wire polys on 8 devices)."""
    from plonky2_tpu.fri.oracle import PolynomialBatch

    rng = np.random.default_rng(3)
    values = rng.integers(0, (1 << 63), size=(135, 32), dtype=np.uint64)

    ref = PolynomialBatch.from_values(values, 3, False, 2)
    with use_mesh(_mesh()):
        sharded, orig = pad_shard_polys(values)
        assert orig == 135
        assert sharded.shape[0] % len(jax.devices()) == 0
        mc = PolynomialBatch.from_values(values, 3, False, 2)
    assert np.asarray(mc.polynomials).shape == (135, 32)
    assert (np.asarray(mc.polynomials) == np.asarray(ref.polynomials)).all()
    assert (np.asarray(mc.lde) == np.asarray(ref.lde)).all()
    assert mc.merkle_tree.cap == ref.merkle_tree.cap


def _mul_chain_circuit(n_muls=40):
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.circuit_data import CircuitConfig

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    cur = x
    for i in range(n_muls):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(cur)
    return b.build(), x


def test_full_prove_under_mesh_bit_identical():
    """(b) full prove under use_mesh == single-device proof, byte for byte.
    Mirrors the driver's dryrun circuit."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    from plonky2_tpu.util import rng

    data, x = _mul_chain_circuit()

    pw = PartialWitness()
    pw.set_target(x, 5)
    rng.seed(1234)  # pin unconstrained-wire fills: proofs become reproducible
    proof_ref = data.prove(pw)
    data.verify(proof_ref)

    pw2 = PartialWitness()
    pw2.set_target(x, 5)
    rng.seed(1234)
    with use_mesh(_mesh()):
        proof_mesh = data.prove(pw2)
    data.verify(proof_mesh)
    rng.seed(None)

    assert proof_to_bytes(proof_mesh) == proof_to_bytes(proof_ref)


def test_recursion_sized_prove_under_mesh():
    """Full prove at a recursion-sized degree (2^12 rows of noop gates, the
    bench_recursion inner shape) under the mesh; bit-identical proof bytes."""
    from plonky2_tpu.gates.simple_gates import NoopGate
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.circuit_data import CircuitConfig
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    from plonky2_tpu.util import rng

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    for _ in range(3500):
        b.add_gate(NoopGate(), [])
    data = b.build()
    assert data.common.degree_bits >= 12

    rng.seed(99)
    proof_ref = data.prove(PartialWitness())
    data.verify(proof_ref)
    rng.seed(99)
    with use_mesh(_mesh()):
        proof_mesh = data.prove(PartialWitness())
    data.verify(proof_mesh)
    rng.seed(None)
    assert proof_to_bytes(proof_mesh) == proof_to_bytes(proof_ref)
