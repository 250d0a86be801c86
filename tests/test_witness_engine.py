"""Levelized batch witness engine vs the dynamic worklist scheduler.

Witness values that don't come from RandomValueGenerator must be identical;
circuits with a statically-unknown generator must fall back to the worklist
and still prove.
"""

import numpy as np

from plonky2_tpu.iop.generator import (
    ArithmeticBaseGenerator, generate_partial_witness)
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.circuit_data import CircuitConfig


def _build_mixed_circuit():
    """Chain + wide fan-out exercising arithmetic, constants, copies,
    inverses, equality, splits, random access."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    terms = []
    for i in range(40):
        t = b.mul(x, b.constant(i + 2))
        t = b.add(t, b.constant(3 * i + 1))
        terms.append(t)
    acc = terms[0]
    for t in terms[1:]:
        acc = b.mul(acc, t)
    inv = b.inverse(acc)
    eq = b.is_equal(acc, terms[3])
    lo, hi = b.split_low_high(terms[5], 16, 64)
    acc2 = b.add(b.add(inv, eq.target), b.add(lo, hi))
    b.register_public_input(acc2)
    return b.build(), x


def test_levelized_matches_worklist_deterministic_targets():
    data, x = _build_mixed_circuit()
    pw = PartialWitness()
    pw.set_target(x, 7)

    w_lvl = generate_partial_witness(pw, data.prover_only, data.common)
    assert data.prover_only._generator_levels is not None, (
        "expected static levelization for this circuit")

    # sabotage levelization with a generator lacking static outputs() —
    # the engine must detect it and fall back to the dynamic worklist
    del data.prover_only._generator_levels
    orig_outputs = ArithmeticBaseGenerator.outputs
    try:
        ArithmeticBaseGenerator.outputs = lambda self: None
        w_wl = generate_partial_witness(pw, data.prover_only, data.common)
        assert data.prover_only._generator_levels is None
    finally:
        ArithmeticBaseGenerator.outputs = orig_outputs

    # compare only deterministic reps: those set identically in both runs of
    # the worklist engine (randoms differ run to run)
    w_wl2 = generate_partial_witness(pw, data.prover_only, data.common)
    det = w_wl.known & w_wl2.known & (w_wl.values == w_wl2.values)
    # randoms (and everything downstream of them) differ run-to-run; the
    # deterministic subset must still be the majority and must match exactly
    assert det.sum() > 0.5 * w_wl.known.sum()
    np.testing.assert_array_equal(w_lvl.values[det], w_wl.values[det])
    np.testing.assert_array_equal(w_lvl.known, w_wl.known)


def test_levelized_circuit_proves_and_verifies():
    data, x = _build_mixed_circuit()
    pw = PartialWitness()
    pw.set_target(x, 11)
    proof = data.prove(pw)
    data.verify(proof)
