"""Lookup argument e2e (reference plonky2/src/lookup_test.rs)."""

import pytest

from plonky2_tpu.gadgets.lookup import SMALLER_TABLE, TIP5_TABLE
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def test_one_lookup():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    lut_index = builder.add_lookup_table_from_table(
        list(range(256)), list(TIP5_TABLE)
    )
    inp = builder.add_virtual_target()
    out = builder.add_lookup_from_index(inp, lut_index)
    builder.register_public_input(inp)
    builder.register_public_input(out)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(inp, 17)
    proof = data.prove(pw)
    assert proof.public_inputs == [17, TIP5_TABLE[17]]
    data.verify(proof)


def test_many_lookups_two_tables():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    tip5 = builder.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    small_inps = [2, 4, 6, 8, 10, 12, 14, 16]
    small = builder.add_lookup_table_from_pairs(
        list(zip(small_inps, SMALLER_TABLE))
    )
    outs = []
    inps = []
    for v in [0, 5, 17, 255, 17]:
        t = builder.constant(v)
        inps.append(v)
        outs.append(builder.add_lookup_from_index(t, tip5))
    for v in [2, 10, 16]:
        t = builder.constant(v)
        inps.append(v)
        outs.append(builder.add_lookup_from_index(t, small))
    builder.register_public_inputs(outs)

    data = builder.build()
    proof = data.prove(PartialWitness())
    small_map = dict(zip(small_inps, SMALLER_TABLE))
    expected = [TIP5_TABLE[v] for v in [0, 5, 17, 255, 17]] + [
        small_map[v] for v in [2, 10, 16]
    ]
    assert proof.public_inputs == expected
    data.verify(proof)


def test_lookup_tampered_output_rejected():
    import copy

    from plonky2_tpu.field import scalar as fs

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    lut_index = builder.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    inp = builder.add_virtual_target()
    out = builder.add_lookup_from_index(inp, lut_index)
    builder.register_public_input(inp)
    builder.register_public_input(out)
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(inp, 3)
    proof = data.prove(pw)
    data.verify(proof)
    bad = copy.deepcopy(proof)
    w = bad.proof.openings.lookup_zs[0]
    bad.proof.openings.lookup_zs[0] = (fs.add(w[0], 1), w[1])
    with pytest.raises(Exception):
        data.verify(bad)


def test_unused_lut_panics():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    builder.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    x = builder.add_virtual_target()
    builder.register_public_input(x)
    with pytest.raises(AssertionError):
        builder.build()
