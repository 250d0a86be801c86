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

    @classmethod
    def run_batch(cls, gens, witness):
        import numpy as np

        from plonky2_tpu import native
        from plonky2_tpu.iop.generator import _reps

        if not native.available:
            return _run_once_all(gens, witness)
        n = len(gens)
        x = witness.get_reps(_reps(witness, (g.x for g in gens), n))
        if (x == np.uint64(0)).any():
            raise ZeroDivisionError("inverse of zero in Goldilocks field")
        witness.set_reps(
            _reps(witness, (g.inv for g in gens), n), native.batch_inverse(x))


def _run_once_all(gens, witness):
    from plonky2_tpu.iop.generator import GeneratedValues

    buf = GeneratedValues()
    for g in gens:
        g.run_once(witness, buf)
    for t, v in buf.target_values:
        witness.set_target(t, v)


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

    @classmethod
    def run_batch(cls, gens, witness):
        import numpy as np

        from plonky2_tpu import native
        from plonky2_tpu.field import np_field as npf
        from plonky2_tpu.iop.generator import _reps

        if not native.available:
            return _run_once_all(gens, witness)
        n = len(gens)
        x = witness.get_reps(_reps(witness, (g.x for g in gens), n))
        y = witness.get_reps(_reps(witness, (g.y for g in gens), n))
        diff = npf.sub(x, y)
        eq = (diff == np.uint64(0)).astype(np.uint64)
        inv = native.batch_inverse(diff)  # zeros pass through as 0 = the hint
        witness.set_reps(_reps(witness, (g.equal for g in gens), n), eq)
        witness.set_reps(_reps(witness, (g.inv_hint for g in gens), n), inv)


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
