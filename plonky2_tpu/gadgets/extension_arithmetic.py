"""Extension-field (D=2) target arithmetic on the CircuitBuilder
(reference gadgets/arithmetic_extension.rs).

ExtensionTarget = pair of base targets; ops route through batched
ArithmeticExtensionGate / MulExtensionGate slots with special-case constant
folding and memoization, mirroring the reference's slot economics.
ExtensionAlgebraTarget = D ExtensionTargets (used by in-circuit gate
constraint evaluation).
"""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.arithmetic_extension import (
    ArithmeticExtensionGate,
    MulExtensionGate,
)
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import ExtensionTarget, Target, Wire

D = 2


def _ext_from_range(row: int, rng: range) -> ExtensionTarget:
    return ExtensionTarget(tuple(Wire(row, w) for w in rng))


class QuotientGeneratorExtension(SimpleGenerator):
    def __init__(self, numerator, denominator, quotient):
        self.numerator = numerator
        self.denominator = denominator
        self.quotient = quotient

    def dependencies(self):
        return list(self.numerator.parts) + list(self.denominator.parts)

    def outputs(self):
        return list(self.quotient.parts)

    def run_once(self, witness, out):
        num = witness.get_extension_target(self.numerator)
        den = witness.get_extension_target(self.denominator)
        out.set_extension_target(self.quotient, fs.ext_div(num, den))


class ExtensionArithmeticMixin:
    """Mixed into CircuitBuilder. Uses: add_virtual_target, constant, connect,
    find_slot, add_simple_generator, targets_to_constants."""

    # -- target construction -------------------------------------------------

    def add_virtual_extension_target(self) -> ExtensionTarget:
        return ExtensionTarget(tuple(self.add_virtual_target() for _ in range(D)))

    def add_virtual_extension_targets(self, n: int) -> list[ExtensionTarget]:
        return [self.add_virtual_extension_target() for _ in range(n)]

    def constant_extension(self, c) -> ExtensionTarget:
        c = fs.ext_from_base(c, D) if isinstance(c, int) else tuple(c)
        return ExtensionTarget(tuple(self.constant(x) for x in c))

    def zero_extension(self) -> ExtensionTarget:
        return self.constant_extension(0)

    def one_extension(self) -> ExtensionTarget:
        return self.constant_extension(1)

    def two_extension(self) -> ExtensionTarget:
        return self.constant_extension(2)

    def convert_to_ext(self, t: Target) -> ExtensionTarget:
        return ExtensionTarget((t, self.zero()))

    def connect_extension(self, a: ExtensionTarget, b: ExtensionTarget) -> None:
        for x, y in zip(a.parts, b.parts):
            self.connect(x, y)

    def target_as_constant_ext(self, t: ExtensionTarget):
        cs = [self.target_as_constant(x) for x in t.parts]
        if any(c is None for c in cs):
            return None
        return tuple(cs)

    # -- core slot op --------------------------------------------------------

    def arithmetic_extension(self, const_0: int, const_1: int,
                             m0: ExtensionTarget, m1: ExtensionTarget,
                             addend: ExtensionTarget) -> ExtensionTarget:
        const_0 %= fs.P
        const_1 %= fs.P
        special = self._arithmetic_extension_special_cases(const_0, const_1, m0, m1, addend)
        if special is not None:
            return special
        key = ("ext", const_0, const_1, m0, m1, addend)
        if key in self.base_arithmetic_results:
            return self.base_arithmetic_results[key]
        if self.target_as_constant_ext(addend) == fs.ext_zero(D):
            result = self._compute_mul_extension_operation(const_0, m0, m1)
        else:
            result = self._compute_arithmetic_extension_operation(const_0, const_1, m0, m1, addend)
        self.base_arithmetic_results[key] = result
        return result

    def _compute_arithmetic_extension_operation(self, const_0, const_1, m0, m1, addend):
        gate = ArithmeticExtensionGate.new_from_config(self.config)
        constants = [const_0, const_1]
        row, i = self.find_slot(gate, constants, constants)
        self.connect_extension(m0, _ext_from_range(row, gate.wires_ith_multiplicand_0(i)))
        self.connect_extension(m1, _ext_from_range(row, gate.wires_ith_multiplicand_1(i)))
        self.connect_extension(addend, _ext_from_range(row, gate.wires_ith_addend(i)))
        return _ext_from_range(row, gate.wires_ith_output(i))

    def _compute_mul_extension_operation(self, const_0, m0, m1):
        gate = MulExtensionGate.new_from_config(self.config)
        constants = [const_0]
        row, i = self.find_slot(gate, constants, constants)
        self.connect_extension(m0, _ext_from_range(row, gate.wires_ith_multiplicand_0(i)))
        self.connect_extension(m1, _ext_from_range(row, gate.wires_ith_multiplicand_1(i)))
        return _ext_from_range(row, gate.wires_ith_output(i))

    def _arithmetic_extension_special_cases(self, const_0, const_1, m0, m1, addend):
        zero = fs.ext_zero(D)
        m0_const = self.target_as_constant_ext(m0)
        m1_const = self.target_as_constant_ext(m1)
        addend_const = self.target_as_constant_ext(addend)

        first_term_zero = const_0 == 0 or m0_const == zero or m1_const == zero
        second_term_zero = const_1 == 0 or addend_const == zero

        if first_term_zero:
            first_term_const = zero
        elif m0_const is not None and m1_const is not None:
            first_term_const = fs.ext_scalar_mul(const_0, fs.ext_mul(m0_const, m1_const))
        else:
            first_term_const = None
        if second_term_zero:
            second_term_const = zero
        elif addend_const is not None:
            second_term_const = fs.ext_scalar_mul(const_1, addend_const)
        else:
            second_term_const = None
        if first_term_const is not None and second_term_const is not None:
            return self.constant_extension(fs.ext_add(first_term_const, second_term_const))

        if first_term_zero and const_1 == 1:
            return addend
        if second_term_zero:
            if m0_const is not None and fs.ext_scalar_mul(const_0, m0_const) == fs.ext_one(D):
                return m1
            if m1_const is not None and fs.ext_scalar_mul(const_0, m1_const) == fs.ext_one(D):
                return m0
        return None

    # -- derived ops ---------------------------------------------------------

    def add_extension(self, a, b) -> ExtensionTarget:
        one = self.one_extension()
        return self.arithmetic_extension(1, 1, a, one, b)

    def add_many_extension(self, terms) -> ExtensionTarget:
        acc = self.zero_extension()
        for t in terms:
            acc = self.add_extension(acc, t)
        return acc

    def sub_extension(self, a, b) -> ExtensionTarget:
        one = self.one_extension()
        return self.arithmetic_extension(1, fs.P - 1, a, one, b)

    def mul_extension_with_const(self, const_0, a, b) -> ExtensionTarget:
        return self.arithmetic_extension(const_0, 0, a, b, self.zero_extension())

    def mul_extension(self, a, b) -> ExtensionTarget:
        return self.mul_extension_with_const(1, a, b)

    def square_extension(self, x) -> ExtensionTarget:
        return self.mul_extension(x, x)

    def cube_extension(self, x) -> ExtensionTarget:
        return self.mul_many_extension([x, x, x])

    def mul_many_extension(self, terms) -> ExtensionTarget:
        acc = self.one_extension()
        for t in terms:
            acc = self.mul_extension(acc, t)
        return acc

    def mul_add_extension(self, a, b, c) -> ExtensionTarget:
        return self.arithmetic_extension(1, 1, a, b, c)

    def mul_sub_extension(self, a, b, c) -> ExtensionTarget:
        return self.arithmetic_extension(1, fs.P - 1, a, b, c)

    def add_const_extension(self, x, c: int) -> ExtensionTarget:
        c_ext = self.constant_extension(c % fs.P)
        return self.add_extension(x, c_ext)

    def mul_const_extension(self, c: int, x) -> ExtensionTarget:
        one = self.one_extension()
        return self.arithmetic_extension(c % fs.P, 0, x, one, self.zero_extension())

    def mul_const_add_extension(self, c: int, x, y) -> ExtensionTarget:
        one = self.one_extension()
        return self.arithmetic_extension(c % fs.P, 1, x, one, y)

    def scalar_mul_ext(self, a: Target, b: ExtensionTarget) -> ExtensionTarget:
        a_ext = self.convert_to_ext(a)
        return self.mul_extension(a_ext, b)

    def scalar_mul_add_extension(self, a: Target, b: ExtensionTarget,
                                 c: ExtensionTarget) -> ExtensionTarget:
        a_ext = self.convert_to_ext(a)
        return self.arithmetic_extension(1, 1, a_ext, b, c)

    def exp_power_of_2_extension(self, x, k: int) -> ExtensionTarget:
        for _ in range(k):
            x = self.square_extension(x)
        return x

    def exp_u64_extension(self, x, e: int) -> ExtensionTarget:
        result = self.one_extension()
        b = x
        while e > 0:
            if e & 1:
                result = self.mul_extension(result, b)
            e >>= 1
            if e:
                b = self.square_extension(b)
        return result

    def div_extension(self, num, den) -> ExtensionTarget:
        quotient = self.add_virtual_extension_target()
        self.add_simple_generator(QuotientGeneratorExtension(num, den, quotient))
        # quotient * den = num
        prod = self.mul_extension(quotient, den)
        self.connect_extension(prod, num)
        return quotient

    def inverse_extension(self, x) -> ExtensionTarget:
        return self.div_extension(self.one_extension(), x)

    def select_ext(self, b, x, y) -> ExtensionTarget:
        """b ? x : y with a BoolTarget b."""
        b_ext = self.convert_to_ext(b.target)
        diff = self.sub_extension(x, y)
        return self.mul_add_extension(b_ext, diff, y)
