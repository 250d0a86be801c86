"""Prover-side circuit data serialization: a built circuit round-trips
through bytes and PROVES from the restored data, without rebuilding
(reference generator_serialization.rs:144-183, circuit_data.rs:170-187,
mod.rs:1834-1933)."""

import numpy as np

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.circuit_data import CircuitConfig
from plonky2_tpu.plonk.prover_serialization import (
    circuit_data_from_bytes,
    circuit_data_to_bytes,
    prover_data_from_bytes,
    prover_data_to_bytes,
)
from plonky2_tpu.plonk.serialization import proof_to_bytes
from plonky2_tpu.util import rng


def _roundtrip_and_prove(data, pw_fill, seed=42):
    """Serialize -> restore -> prove from BOTH, assert byte-equal proofs and
    that the original verifier accepts the restored prover's proof."""
    blob = circuit_data_to_bytes(data)
    restored = circuit_data_from_bytes(blob)

    # second serialization of the restored data must be byte-stable
    assert circuit_data_to_bytes(restored) == blob

    rng.seed(seed)
    proof_orig = data.prove(pw_fill())
    rng.seed(seed)
    proof_restored = restored.prove(pw_fill())
    rng.seed(None)

    data.verify(proof_restored)
    restored.verify(proof_orig)
    assert proof_to_bytes(proof_orig) == proof_to_bytes(proof_restored)
    return restored


def test_arithmetic_circuit_roundtrip():
    """Covers Arithmetic/Constant/Copy/RandomValue/PublicInput generators."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    cur = x
    for i in range(25):
        cur = b.mul(cur, b.constant(i % 7 + 2))
    b.register_public_input(cur)
    data = b.build()

    def fill():
        pw = PartialWitness()
        pw.set_target(x, 3)
        return pw

    _roundtrip_and_prove(data, fill)


def test_gadget_circuit_roundtrip():
    """Covers Inverse/Equality/LowHigh/BaseSplit/RandomAccess generators."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    inv = b.inverse(x)
    eq = b.is_equal(x, inv)
    low, high = b.split_low_high(x, 8, 16)
    arr = [b.constant(i * 11 + 1) for i in range(4)]
    idx = b.constant(2)
    sel = b.random_access(idx, arr)
    b.register_public_inputs([inv, eq.target, low, high, sel])
    data = b.build()

    def fill():
        pw = PartialWitness()
        pw.set_target(x, 1234)
        return pw

    _roundtrip_and_prove(data, fill)


def test_lookup_circuit_roundtrip():
    """Covers Lookup/LookupTable generators + lut_to_lookups/lookup_rows."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    lut = [(i, (i * i + 3) % 256) for i in range(16)]
    lut_index = b.add_lookup_table_from_pairs(lut)
    inp = b.add_virtual_target()
    out = b.add_lookup_from_index(inp, lut_index)
    b.register_public_input(out)
    data = b.build()

    def fill():
        pw = PartialWitness()
        pw.set_target(inp, 5)
        return pw

    _roundtrip_and_prove(data, fill)


def test_prover_data_roundtrip():
    """ProverCircuitData (common + prover_only, no verifier data) dual
    (reference circuit_data.rs:268-287)."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.exp_u64(x, 11)
    b.register_public_input(y)
    data = b.build()

    blob = prover_data_to_bytes(data.prover_only, data.common)
    prover_only, common = prover_data_from_bytes(blob)
    assert prover_data_to_bytes(prover_only, common) == blob

    pw = PartialWitness()
    pw.set_target(x, 3)
    rng.seed(7)
    proof = __import__("plonky2_tpu.plonk.prover", fromlist=["prove"]).prove(
        prover_only, common, pw)
    rng.seed(None)
    data.verify(proof)


def test_dummy_proof_generator_roundtrip():
    """Covers DummyProofGenerator (nested proof + verifier data payload,
    reference dummy_circuit.rs:289-301)."""
    from plonky2_tpu.recursion.dummy_circuit import dummy_proof_and_vk
    from tests.test_plonk_e2e import build_factorial

    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    inner_common = build_factorial()[0].common

    proof_t, vk_t = dummy_proof_and_vk(b, inner_common)
    b.register_public_inputs(proof_t.public_inputs)
    data = b.build()

    _roundtrip_and_prove(data, PartialWitness, seed=11)
