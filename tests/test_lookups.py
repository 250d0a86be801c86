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


def test_no_lookup():
    """Circuit without lookups proves under the same config
    (reference lookup_test.rs:30-45)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    y = builder.mul(x, builder.constant(7))
    builder.register_public_input(y)
    data = builder.build()
    assert data.common.num_lookup_polys == 0
    pw = PartialWitness()
    pw.set_target(x, 6)
    proof = data.prove(pw)
    assert proof.public_inputs == [42]
    data.verify(proof)


def test_lookup_without_table_panics():
    """add_lookup_from_index on a nonexistent LUT index fails
    (reference lookup_test.rs:62-75)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    dummy = builder.add_virtual_target()
    with pytest.raises(Exception):
        builder.add_lookup_from_index(dummy, 0)
        builder.build()


def test_different_inputs():
    """Two lookups with runtime (virtual-target) inputs into one small LUT,
    their sum looked up in a second LUT (reference lookup_test.rs:206-280)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    init_a, init_b = 1, 2
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()

    small_pairs = list(zip(range(2, 10), SMALLER_TABLE))
    other = [((i * 7 + 3) % 256) for i in range(256)]
    other_pairs = list(zip(range(256), other))

    small_index = builder.add_lookup_table_from_pairs(small_pairs)
    out_a = builder.add_lookup_from_index(a, small_index)
    out_b = builder.add_lookup_from_index(b, small_index)
    s = builder.add(out_a, out_b)
    other_index = builder.add_lookup_table_from_pairs(other_pairs)
    out_final = builder.add_lookup_from_index(s, other_index)

    builder.register_public_inputs([a, b, out_final])
    data = builder.build()

    small_map = dict(small_pairs)
    look_a, look_b = 4, 7
    pw = PartialWitness()
    pw.set_target(a, look_a)
    pw.set_target(b, look_b)
    proof = data.prove(pw)
    expected = other[small_map[look_a] + small_map[look_b]]
    assert proof.public_inputs == [look_a, look_b, expected]
    data.verify(proof)


def test_many_lookups():
    """~600 lookups on one LUT — spans many LookupGates and multiple
    partial-SLDC columns (reference lookup_test.rs:283-362)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    tip5_index = builder.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    outs = []
    vals = [(i * 37 + 11) % 256 for i in range(600)]
    for v in vals:
        outs.append(builder.add_lookup_from_index(builder.constant(v), tip5_index))
    # spot-check a few outputs as public inputs (600 PIs would bloat hashing)
    builder.register_public_inputs([outs[0], outs[299], outs[599]])
    data = builder.build()
    proof = data.prove(PartialWitness())
    assert proof.public_inputs == [TIP5_TABLE[vals[0]], TIP5_TABLE[vals[299]],
                                   TIP5_TABLE[vals[599]]]
    data.verify(proof)


def test_same_luts():
    """The same table registered twice gets two independent LUT instances
    (reference lookup_test.rs:365-417)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    pairs = list(zip(range(256), TIP5_TABLE))
    t1 = builder.add_lookup_table_from_pairs(pairs)
    out_a = builder.add_lookup_from_index(a, t1)
    out_b = builder.add_lookup_from_index(b, t1)
    s = builder.add(out_a, out_b)
    # identical tables dedup to one LUT (reference circuit_builder.rs:798-808
    # is_stored); the second registration returns the same index
    t2 = builder.add_lookup_table_from_pairs(pairs)
    assert t2 == t1
    out_final = builder.add_lookup_from_index(s, t2)
    builder.register_public_inputs([a, b, out_final])
    data = builder.build()

    pw = PartialWitness()
    pw.set_target(a, 1)
    pw.set_target(b, 2)
    proof = data.prove(pw)
    assert proof.public_inputs == [1, 2, TIP5_TABLE[TIP5_TABLE[1] + TIP5_TABLE[2]]]
    data.verify(proof)


def test_big_lut():
    """A 2^16-entry LUT via add_lookup_table_from_fn
    (reference lookup_test.rs:420-460, LUT_SIZE = u16::MAX + 1)."""
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    inputs = list(range(1 << 16))
    lut_fn = lambda inp: inp // 10
    lut_index = builder.add_lookup_table_from_fn(lut_fn, inputs)
    a = builder.add_virtual_target()
    b = builder.add_virtual_target()
    out_a = builder.add_lookup_from_index(a, lut_index)
    out_b = builder.add_lookup_from_index(b, lut_index)
    builder.register_public_inputs([out_a, out_b])
    data = builder.build()

    look_a, look_b = 51, 2 ** 15
    pw = PartialWitness()
    pw.set_target(a, look_a)
    pw.set_target(b, look_b)
    proof = data.prove(pw)
    assert proof.public_inputs == [lut_fn(look_a), lut_fn(look_b)]
    data.verify(proof)


def test_lookup_inside_recursion():
    """A proof with lookups verified inside another circuit: the recursive
    verifier handles lookup openings + constraints (reference
    bench_recursion.rs --lookup_type exercises this path)."""
    from plonky2_tpu.recursion.recursive_verifier import (
        add_virtual_proof_with_pis,
        add_virtual_verifier_data,
        set_proof_with_pis_target,
        set_verifier_data_target,
        verify_proof,
    )

    inner_b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    lut_index = inner_b.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    inp = inner_b.add_virtual_target()
    out = inner_b.add_lookup_from_index(inp, lut_index)
    inner_b.register_public_inputs([inp, out])
    inner = inner_b.build()
    pw = PartialWitness()
    pw.set_target(inp, 123)
    inner_proof = inner.prove(pw)
    inner.verify(inner_proof)

    outer_b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_proof_with_pis(outer_b, inner.common)
    vdt = add_virtual_verifier_data(outer_b, inner.common.config.fri_config.cap_height)
    verify_proof(outer_b, pt, vdt, inner.common)
    outer_b.register_public_inputs(pt.public_inputs)
    outer = outer_b.build()

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vdt, inner.verifier_only)
    outer_proof = outer.prove(pw)
    assert outer_proof.public_inputs == [123, TIP5_TABLE[123]]
    outer.verify(outer_proof)


def test_device_lookup_polys_bit_identical_to_host():
    """The device associative-scan RE/SLDC columns and device LUT-binding
    evals match the host row recurrences bit-for-bit on random deltas
    (round 4; reference plonk/prover.rs:458-605, vanishing_poly.rs:30)."""
    import numpy as np
    import jax.numpy as jnp

    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.plonk import prover as pp
    from plonky2_tpu.plonk.vanishing_poly import NUM_COINS_LOOKUP, eval_lut_poly

    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    lut = b.add_lookup_table_from_table(list(range(16)),
                                        [(7 * i + 3) % 16 for i in range(16)])
    x = b.add_virtual_target()
    out = b.add_lookup_from_index(x, lut)
    b.register_public_input(out)
    cur = out
    for i in range(60):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(cur)
    data = b.build()
    common, pd = data.common, data.prover_only

    pw = PartialWitness()
    pw.set_target(x, 5)
    partition = generate_partial_witness(pw, pd, common)
    pp.set_lookup_wires(pd, common, partition)
    witness = partition.full_witness()

    r = np.random.default_rng(42)
    nc = common.config.num_challenges
    deltas = [int(v) for v in r.integers(1, 1 << 63, size=NUM_COINS_LOOKUP * nc)]

    host = []
    for c in range(nc):
        host.extend(pp.compute_lookup_polys(
            witness, deltas[c * NUM_COINS_LOOKUP:(c + 1) * NUM_COINS_LOOKUP],
            pd, common))
    host = np.asarray(host, dtype=np.uint64)
    dev = np.asarray(pp.compute_lookup_polys_device(
        witness, jnp.asarray(np.asarray(deltas, dtype=np.uint64)), pd, common))
    np.testing.assert_array_equal(host, dev)

    host_evals = np.asarray(
        [[eval_lut_poly(common, l,
                        deltas[c * NUM_COINS_LOOKUP:(c + 1) * NUM_COINS_LOOKUP])
          for l in range(len(common.luts))] for c in range(nc)], dtype=np.uint64)
    dev_evals = np.asarray(pp._lut_evals_device(
        common, jnp.asarray(np.asarray(deltas, dtype=np.uint64))))
    np.testing.assert_array_equal(host_evals, dev_evals)
