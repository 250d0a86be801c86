"""Bit-decomposition and range-check gadgets
(reference gadgets/split_join.rs, gadgets/range_check.rs)."""

from __future__ import annotations

from plonky2_tpu.gates.base_sum import BaseSumGate
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import BoolTarget, Target, Wire


class WireSplitGenerator(SimpleGenerator):
    """Distributes an integer across the sum wires of k BaseSum<2> gates."""

    def __init__(self, integer: Target, gates: list[int], num_limbs: int):
        self.integer = integer
        self.gates = gates
        self.num_limbs = num_limbs

    def dependencies(self):
        return [self.integer]

    def outputs(self):
        return [Wire(row, BaseSumGate.WIRE_SUM) for row in self.gates]

    def run_once(self, witness, out):
        v = witness.get_target(self.integer)
        for row in self.gates:
            out.set_target(Wire(row, BaseSumGate.WIRE_SUM), v & ((1 << self.num_limbs) - 1))
            v >>= self.num_limbs
        assert v == 0, f"Integer too large to fit in {len(self.gates)} limb gates"


class LowHighGenerator(SimpleGenerator):
    def __init__(self, integer: Target, n_log: int, low: Target, high: Target):
        self.integer = integer
        self.n_log = n_log
        self.low = low
        self.high = high

    def dependencies(self):
        return [self.integer]

    def outputs(self):
        return [self.low, self.high]

    def run_once(self, witness, out):
        v = witness.get_target(self.integer)
        out.set_target(self.low, v & ((1 << self.n_log) - 1))
        out.set_target(self.high, v >> self.n_log)


def split_le(builder, integer: Target, num_bits: int) -> list[BoolTarget]:
    """Little-endian bit decomposition via BaseSum<2> gates
    (reference split_join.rs:25-59)."""
    if num_bits == 0:
        return []
    gate_type = BaseSumGate.new_from_config(builder.config, 2)
    k = (num_bits + gate_type.num_limbs - 1) // gate_type.num_limbs
    gates = [builder.add_gate(BaseSumGate(gate_type.num_limbs, 2), []) for _ in range(k)]

    bits = [
        BoolTarget(Wire(row, limb_column))
        for row in gates
        for limb_column in gate_type.limbs()
    ]
    for b in bits[num_bits:]:
        builder.assert_zero(b.target)
    bits = bits[:num_bits]

    base = pow(2, gate_type.num_limbs)
    acc = builder.zero()
    for row in reversed(gates):
        sum_wire = Wire(row, BaseSumGate.WIRE_SUM)
        acc = builder.mul_const_add(base, acc, sum_wire)
    builder.connect(acc, integer)

    builder.add_simple_generator(WireSplitGenerator(integer, gates, gate_type.num_limbs))
    return bits


def range_check(builder, x: Target, n_log: int) -> None:
    split_le(builder, x, n_log)


def low_bits(builder, x: Target, num_low_bits: int, num_bits: int) -> list[BoolTarget]:
    return split_le(builder, x, num_bits)[:num_low_bits]


def split_low_high(builder, x: Target, n_log: int, num_bits: int) -> tuple[Target, Target]:
    """(low, high) with x = low + 2^n_log * high (reference range_check.rs:35-53)."""
    low = builder.add_virtual_target()
    high = builder.add_virtual_target()
    builder.add_simple_generator(LowHighGenerator(x, n_log, low, high))
    range_check(builder, low, n_log)
    range_check(builder, high, num_bits - n_log)
    pow2 = builder.constant(1 << n_log)
    comp_x = builder.mul_add(high, pow2, low)
    builder.connect(x, comp_x)
    return low, high
