"""ReducingFactorTarget: in-circuit Horner alpha-reduction with shift count
(reference util/reducing.rs:113-260). Emits ReducingGate /
ReducingExtensionGate rows for long reductions, arithmetic slots otherwise."""

from __future__ import annotations

from plonky2_tpu.gates.arithmetic_extension import ArithmeticExtensionGate
from plonky2_tpu.gates.reducing import ReducingExtensionGate, ReducingGate
from plonky2_tpu.iop.target import ExtensionTarget, Wire


def _ext_from_range(row, rng):
    return ExtensionTarget(tuple(Wire(row, w) for w in rng))


class ReducingFactorTarget:
    def __init__(self, base: ExtensionTarget):
        self.base = base
        self.count = 0

    def reduce_base(self, terms, builder) -> ExtensionTarget:
        """terms: base Targets."""
        terms = list(terms)
        l = len(terms)
        if l <= ArithmeticExtensionGate.new_from_config(builder.config).num_ops + 1:
            return self.reduce_arithmetic(
                [builder.convert_to_ext(t) for t in terms], builder
            )
        max_coeffs_len = ReducingGate.max_coeffs_len(
            builder.config.num_wires, builder.config.num_routed_wires
        )
        self.count += l
        zero = builder.zero()
        acc = builder.zero_extension()
        reversed_terms = list(terms)
        while len(reversed_terms) % max_coeffs_len != 0:
            reversed_terms.append(zero)
        reversed_terms.reverse()
        for start in range(0, len(reversed_terms), max_coeffs_len):
            chunk = reversed_terms[start:start + max_coeffs_len]
            gate = ReducingGate(max_coeffs_len)
            row = builder.add_gate(gate, [])
            builder.connect_extension(
                self.base, _ext_from_range(row, ReducingGate.wires_alpha())
            )
            builder.connect_extension(
                acc, _ext_from_range(row, ReducingGate.wires_old_acc())
            )
            for t, c in zip(chunk, gate.wires_coeffs()):
                builder.connect(t, Wire(row, c))
            acc = _ext_from_range(row, ReducingGate.wires_output())
        return acc

    def reduce(self, terms, builder) -> ExtensionTarget:
        """terms: ExtensionTargets."""
        terms = list(terms)
        l = len(terms)
        if l <= ArithmeticExtensionGate.new_from_config(builder.config).num_ops + 1:
            return self.reduce_arithmetic(terms, builder)
        max_coeffs_len = ReducingExtensionGate.max_coeffs_len(
            builder.config.num_wires, builder.config.num_routed_wires
        )
        self.count += l
        zero_ext = builder.zero_extension()
        acc = zero_ext
        reversed_terms = list(terms)
        while len(reversed_terms) % max_coeffs_len != 0:
            reversed_terms.append(zero_ext)
        reversed_terms.reverse()
        for start in range(0, len(reversed_terms), max_coeffs_len):
            chunk = reversed_terms[start:start + max_coeffs_len]
            gate = ReducingExtensionGate(max_coeffs_len)
            row = builder.add_gate(gate, [])
            builder.connect_extension(
                self.base, _ext_from_range(row, ReducingExtensionGate.wires_alpha())
            )
            builder.connect_extension(
                acc, _ext_from_range(row, ReducingExtensionGate.wires_old_acc())
            )
            for i, t in enumerate(chunk):
                builder.connect_extension(
                    t, _ext_from_range(row, ReducingExtensionGate.wires_coeff(i))
                )
            acc = _ext_from_range(row, ReducingExtensionGate.wires_output())
        return acc

    def reduce_arithmetic(self, terms, builder) -> ExtensionTarget:
        self.count += len(terms)
        acc = builder.zero_extension()
        for et in reversed(terms):
            acc = builder.mul_add_extension(self.base, acc, et)
        return acc

    def shift(self, x: ExtensionTarget, builder) -> ExtensionTarget:
        if self.count == 0:
            return x
        exp = builder.exp_u64_extension(self.base, self.count)
        self.count = 0
        return builder.mul_extension(exp, x)
