"""ExponentiationGate: x^e with bit-decomposed exponent
(reference gates/exponentiation.rs)."""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import Wire


class ExponentiationGate(Gate):
    def __init__(self, num_power_bits: int):
        self.num_power_bits = num_power_bits

    @staticmethod
    def new_from_config(config) -> "ExponentiationGate":
        max_routed = config.num_routed_wires - 2
        max_wires = (config.num_wires - 2) // 2
        return ExponentiationGate(min(max_routed, max_wires))

    def wire_base(self) -> int:
        return 0

    def wire_power_bit(self, i: int) -> int:
        return 1 + i

    def wire_output(self) -> int:
        return 1 + self.num_power_bits

    def wire_intermediate_value(self, i: int) -> int:
        return 2 + self.num_power_bits + i

    def id(self) -> str:
        return f"ExponentiationGate {{ num_power_bits: {self.num_power_bits} }}<D=2>"

    def eval_unfiltered(self, ops, vars) -> list:
        base = vars.local_wires[self.wire_base()]
        power_bits = [vars.local_wires[self.wire_power_bit(i)] for i in range(self.num_power_bits)]
        intermediates = [
            vars.local_wires[self.wire_intermediate_value(i)]
            for i in range(self.num_power_bits)
        ]
        output = vars.local_wires[self.wire_output()]

        constraints = []
        for i in range(self.num_power_bits):
            prev = ops.one() if i == 0 else ops.square(intermediates[i - 1])
            cur_bit = power_bits[self.num_power_bits - i - 1]
            not_cur_bit = ops.sub(ops.one(), cur_bit)
            computed = ops.mul(prev, ops.add(ops.mul(cur_bit, base), not_cur_bit))
            constraints.append(ops.sub(computed, intermediates[i]))
        constraints.append(ops.sub(output, intermediates[self.num_power_bits - 1]))
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized: each step's `prev` reads the previous intermediate
        from witness wires, so the num_power_bits constraints are independent
        (same values/order as eval_unfiltered)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        n = self.num_power_bits
        base = wires[self.wire_base()][None]  # [1, Q]
        bits_rev = wires[1:1 + n][::-1]  # bit for step i is power_bit[n-1-i]
        interm = wires[2 + n:2 + 2 * n]  # [n, Q]
        one = jnp.ones((), dtype=jnp.uint64)
        prev = jnp.concatenate(
            [jnp.ones((1, wires.shape[-1]), dtype=jnp.uint64),
             g.mul(interm[:-1], interm[:-1])])
        mult = g.add(g.mul(bits_rev, base), g.sub(one, bits_rev))
        steps = g.sub(g.mul(prev, mult), interm)
        last = g.sub(wires[self.wire_output()], interm[-1])
        return jnp.concatenate([steps, last[None]], axis=0)

    def generators(self, row: int, local_constants) -> list:
        return [ExponentiationGenerator(row, self.num_power_bits)]

    def num_wires(self) -> int:
        return self.wire_intermediate_value(self.num_power_bits - 1) + 1

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 4

    def num_constraints(self) -> int:
        return self.num_power_bits + 1


class ExponentiationGenerator(SimpleGenerator):
    def __init__(self, row: int, num_power_bits: int):
        self.row = row
        self.num_power_bits = num_power_bits

    def _gate(self) -> ExponentiationGate:
        return ExponentiationGate(self.num_power_bits)

    def dependencies(self):
        gate = self._gate()
        return [Wire(self.row, gate.wire_base())] + [
            Wire(self.row, gate.wire_power_bit(i)) for i in range(self.num_power_bits)
        ]

    def outputs(self):
        gate = self._gate()
        return [Wire(self.row, gate.wire_intermediate_value(i))
                for i in range(self.num_power_bits)] + [
            Wire(self.row, gate.wire_output())]

    def run_once(self, witness, out):
        gate = self._gate()
        row = self.row
        base = witness.get_target(Wire(row, gate.wire_base()))
        bits = [
            witness.get_target(Wire(row, gate.wire_power_bit(i)))
            for i in range(self.num_power_bits)
        ]
        intermediates = []
        cur = 1
        for i in range(self.num_power_bits):
            if bits[self.num_power_bits - i - 1] == 1:
                cur = fs.mul(cur, base)
            intermediates.append(cur)
            cur = fs.mul(cur, cur)
        for i, v in enumerate(intermediates):
            out.set_target(Wire(row, gate.wire_intermediate_value(i)), v)
        out.set_target(Wire(row, gate.wire_output()), intermediates[-1])
