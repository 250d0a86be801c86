"""ArithmeticGate: batched `const_0 * m0 * m1 + const_1 * addend` ops
(reference gates/arithmetic_base.rs)."""

from __future__ import annotations

from plonky2_tpu.gates.gate import Gate


class ArithmeticGate(Gate):
    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def new_from_config(config) -> "ArithmeticGate":
        return ArithmeticGate(ArithmeticGate.num_ops_from_config(config))

    @staticmethod
    def num_ops_from_config(config) -> int:
        wires_per_op = 4
        return config.num_routed_wires // wires_per_op

    @staticmethod
    def wire_ith_multiplicand_0(i: int) -> int:
        return 4 * i

    @staticmethod
    def wire_ith_multiplicand_1(i: int) -> int:
        return 4 * i + 1

    @staticmethod
    def wire_ith_addend(i: int) -> int:
        return 4 * i + 2

    @staticmethod
    def wire_ith_output(i: int) -> int:
        return 4 * i + 3

    def id(self) -> str:
        return f"ArithmeticGate {{ num_ops: {self.num_ops} }}"

    def eval_unfiltered(self, ops, vars) -> list:
        const_0 = vars.local_constants[0]
        const_1 = vars.local_constants[1]
        constraints = []
        for i in range(self.num_ops):
            m0 = vars.local_wires[self.wire_ith_multiplicand_0(i)]
            m1 = vars.local_wires[self.wire_ith_multiplicand_1(i)]
            addend = vars.local_wires[self.wire_ith_addend(i)]
            output = vars.local_wires[self.wire_ith_output(i)]
            computed = ops.add(ops.mul(ops.mul(m0, m1), const_0), ops.mul(addend, const_1))
            constraints.append(ops.sub(output, computed))
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized: all num_ops constraints in one batched op set."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        n = self.num_ops
        take = lambda off: jnp.take(
            wires, jnp.asarray(np.arange(off, 4 * n, 4, dtype=np.int32)), axis=0)
        computed = g.add(g.mul(g.mul(take(0), take(1)), constants[0][None]),
                         g.mul(take(2), constants[1][None]))
        return g.sub(take(3), computed)

    def generators(self, row: int, local_constants: list[int]) -> list:
        from plonky2_tpu.iop.generator import ArithmeticBaseGenerator

        return [
            ArithmeticBaseGenerator(row, local_constants[0], local_constants[1], i)
            for i in range(self.num_ops)
        ]

    def num_wires(self) -> int:
        return self.num_ops * 4

    def num_constants(self) -> int:
        return 2

    def degree(self) -> int:
        return 3

    def num_constraints(self) -> int:
        return self.num_ops
