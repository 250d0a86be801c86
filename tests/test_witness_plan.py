"""Compiled native witness plan (iop/witness_plan.py) vs the levelized
Python batch engine: full-witness bit-identity under a pinned rng seed, and
byte-identical proofs with the plan on vs off.

The plan executor is the C dual of every SimpleGenerator.run_once (reference
iop/generator.rs:206-234); random draws must consume the seedable prover rng
(util/rng.py) in the same order as the levelized engine so seeded proofs are
byte-stable across engines.
"""

import os

import numpy as np
import pytest

from plonky2_tpu import native
from plonky2_tpu.iop.generator import generate_partial_witness
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.circuit_data import CircuitConfig
from plonky2_tpu.util import rng

pytestmark = pytest.mark.skipif(
    not native.available, reason="native library unavailable")


def _plan_off():
    os.environ["PLONKY2_TPU_WITNESS_PLAN"] = "0"


def _plan_on():
    os.environ["PLONKY2_TPU_WITNESS_PLAN"] = "1"


@pytest.fixture(autouse=True)
def _restore_plan_env():
    prev = os.environ.get("PLONKY2_TPU_WITNESS_PLAN")
    yield
    if prev is None:
        os.environ.pop("PLONKY2_TPU_WITNESS_PLAN", None)
    else:
        os.environ["PLONKY2_TPU_WITNESS_PLAN"] = prev


def _rich_circuit():
    """Touches every plan opcode family reachable from builder gadgets:
    arithmetic (base+ext), mul-ext, poseidon, random access, reducing,
    interpolation (via FRI-ish gadgets), splits, inverse, equality, exp."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    xe = b.convert_to_ext(x)
    # base + ext arithmetic, mul ext
    y = b.mul_add(x, x, b.constant(5))
    ye = b.mul_extension(xe, xe)
    ze = b.add_extension(ye, b.mul_extension(xe, ye))
    qe = b.div_extension(ze, ye)
    # poseidon (hash gadget)
    h = b.hash_n_to_hash_no_pad([x, y] * 5)
    # random access
    arr = [b.constant(10 + i) for i in range(8)]
    idx = b.constant(3)
    ra = b.random_access(idx, arr)
    # splits / range checks / low-high
    lo, hi = b.split_low_high(y, 12, 64)
    bits = b.split_le(ra, 8)
    # exponentiation
    e = b.exp_u64(x, 13)
    # inverse + equality
    inv = b.inverse(y)
    eq = b.is_equal(x, y)
    s = b.add_many([h[0], ra, lo, hi, e, inv, eq.target,
                    qe.parts[0], bits[0].target])
    b.register_public_input(s)
    return b.build(), x


def test_plan_matches_levelized_bitwise():
    data, x = _rich_circuit()
    pw = PartialWitness()
    pw.set_target(x, 12345)

    _plan_off()
    rng.seed(77)
    w_ref = generate_partial_witness(pw, data.prover_only, data.common)

    _plan_on()
    rng.seed(77)
    w_plan = generate_partial_witness(pw, data.prover_only, data.common)
    plan = data.prover_only._witness_plan
    assert plan.fully_native, (
        "rich circuit should compile fully; py-fallback segments: "
        f"{[s for s in plan.segments if s[0] != 'c']}")

    assert (w_ref.known == w_plan.known).all()
    ref = np.where(w_ref.known, w_ref.values, 0)
    got = np.where(w_plan.known, w_plan.values, 0)
    assert (ref == got).all()


def test_plan_proof_bytes_identical():
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    data, x = _rich_circuit()
    pw = PartialWitness()
    pw.set_target(x, 999)

    _plan_off()
    rng.seed(31)
    p_ref = data.prove(pw)
    _plan_on()
    rng.seed(31)
    p_plan = data.prove(pw)
    data.verify(p_plan)
    assert proof_to_bytes(p_ref) == proof_to_bytes(p_plan)


def test_plan_detects_inconsistent_witness():
    """A zero denominator must raise, not write garbage."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    inv = b.inverse(x)
    b.register_public_input(inv)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 0)
    _plan_on()
    with pytest.raises((RuntimeError, ZeroDivisionError, AssertionError,
                        ValueError)):
        generate_partial_witness(pw, data.prover_only, data.common)


def test_plan_python_fallback_for_unknown_generator():
    """Circuits with a generator type lacking an opcode still generate
    (mixed C/python segments)."""
    from plonky2_tpu.iop.generator import SimpleGenerator

    class OddGen(SimpleGenerator):
        def __init__(self, src, dst):
            self.src, self.dst = src, dst

        def dependencies(self):
            return [self.src]

        def outputs(self):
            return [self.dst]

        def run_once(self, witness, out):
            v = witness.get_target(self.src)
            out.set_target(self.dst, (v * 3 + 1) % 0xFFFFFFFF00000001)

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.add_virtual_target()
    b.add_simple_generator(OddGen(x, y))
    z = b.mul(y, y)
    b.register_public_input(z)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 11)
    _plan_on()
    w = generate_partial_witness(pw, data.prover_only, data.common)
    plan = data.prover_only._witness_plan
    assert not plan.fully_native
    assert w.get_target(y) == (11 * 3 + 1)


def test_plan_lookup_circuit_fully_native():
    """Lookup circuits compile fully native (WP_LOOKUP with shared-table
    aux tail + WP_CONSTANT_PAIR for the LUT fills) and prove byte-identically
    to the levelized engine (VERDICT r4 #7)."""
    from plonky2_tpu.gadgets.lookup import TIP5_TABLE
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    tip5_idx = b.add_lookup_table_from_table(list(range(256)),
                                             list(TIP5_TABLE))
    a = b.add_virtual_target()
    out = b.add_lookup_from_index(a, tip5_idx)
    for _ in range(40):
        b.add_lookup_from_index(out, 0)
    b.register_public_input(out)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(a, 2)

    _plan_on()
    rng.seed(19)
    p_plan = data.prove(pw)
    data.verify(p_plan)
    plan = data.prover_only._witness_plan
    assert plan.fully_native, (
        f"py-fallback segments: {[s for s in plan.segments if s[0] != 'c']}")

    _plan_off()
    data.prover_only._witness_plan = None
    rng.seed(19)
    p_ref = data.prove(pw)
    assert proof_to_bytes(p_ref) == proof_to_bytes(p_plan)


def test_plan_lookup_rejects_bad_input():
    """WP_LOOKUP: an input outside the LUT fails loudly (reference
    LookupGenerator 'Incorrect input value provided')."""
    from plonky2_tpu.gadgets.lookup import TIP5_TABLE

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    tip5_idx = b.add_lookup_table_from_table(list(range(256)),
                                             list(TIP5_TABLE))
    a = b.add_virtual_target()
    out = b.add_lookup_from_index(a, tip5_idx)
    b.register_public_input(out)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(a, 4096)  # not a TIP5 key
    _plan_on()
    with pytest.raises((RuntimeError, ValueError)):
        generate_partial_witness(pw, data.prover_only, data.common)


def test_plan_missing_input_raises():
    """An absent PartialWitness input raises the old-style unset-read error
    instead of the C executor silently reading 0 (ADVICE r4 medium)."""
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    y = b.mul(x, x)
    b.register_public_input(y)
    data = b.build()
    _plan_on()
    with pytest.raises((ValueError, AssertionError),
                       match="unset|not set|starv"):
        generate_partial_witness(PartialWitness(), data.prover_only,
                                 data.common)
