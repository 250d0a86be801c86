"""Inverse and equality gadgets (reference gadgets/arithmetic.rs).

Both introduce a hint target filled by a generator plus constraints that make
the hint sound: `inverse` pins x * x_inv = 1; `is_equal` uses the standard
(x-y) * m = 1 - eq, eq * (x-y) = 0 construction.
"""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import BoolTarget, Target


class InverseGenerator(SimpleGenerator):
    def __init__(self, x: Target, inv: Target):
        self.x = x
        self.inv = inv

    def dependencies(self):
        return [self.x]

    def outputs(self):
        return [self.inv]

    def run_once(self, witness, out_buffer):
        v = witness.get_target(self.x)
        out_buffer.set_target(self.inv, fs.inverse(v))


def add_inverse(builder, x: Target) -> Target:
    inv = builder.add_virtual_target()
    builder.add_simple_generator(InverseGenerator(x, inv))
    prod = builder.mul(x, inv)
    builder.connect(prod, builder.one())
    return inv


class EqualityGenerator(SimpleGenerator):
    def __init__(self, x: Target, y: Target, equal: Target, inv_hint: Target):
        self.x = x
        self.y = y
        self.equal = equal
        self.inv_hint = inv_hint

    def dependencies(self):
        return [self.x, self.y]

    def outputs(self):
        return [self.equal, self.inv_hint]

    def run_once(self, witness, out_buffer):
        diff = fs.sub(witness.get_target(self.x), witness.get_target(self.y))
        if diff == 0:
            out_buffer.set_target(self.equal, 1)
            out_buffer.set_target(self.inv_hint, 0)
        else:
            out_buffer.set_target(self.equal, 0)
            out_buffer.set_target(self.inv_hint, fs.inverse(diff))


def is_equal(builder, x: Target, y: Target) -> BoolTarget:
    equal = builder.add_virtual_target()
    inv_hint = builder.add_virtual_target()
    builder.add_simple_generator(EqualityGenerator(x, y, equal, inv_hint))
    diff = builder.sub(x, y)
    # diff * inv_hint = 1 - equal  and  equal * diff = 0
    diff_times_hint = builder.mul(diff, inv_hint)
    one_minus_equal = builder.sub(builder.one(), equal)
    builder.connect(diff_times_hint, one_minus_equal)
    eq_times_diff = builder.mul(equal, diff)
    builder.assert_zero(eq_times_diff)
    return BoolTarget(equal)
