"""ArithmeticExtensionGate and MulExtensionGate: batched extension-field ops
(reference gates/arithmetic_extension.rs, gates/multiplication_extension.rs).

Wire groups of D consecutive wires hold extension elements; constraints are
evaluated in the extension ALGEBRA (D-dim algebra over the ops domain) and
flattened to D base constraints per op."""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.gates.ops import ealg_add, ealg_from_base, ealg_mul, ealg_scalar_mul, ealg_sub
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import ExtensionTarget, Wire

D = 2


class ArithmeticExtensionGate(Gate):
    """const_0 * m0 * m1 + const_1 * addend over F_{p^D}."""

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def new_from_config(config) -> "ArithmeticExtensionGate":
        return ArithmeticExtensionGate(config.num_routed_wires // (4 * D))

    @staticmethod
    def wires_ith_multiplicand_0(i: int) -> range:
        return range(4 * D * i, 4 * D * i + D)

    @staticmethod
    def wires_ith_multiplicand_1(i: int) -> range:
        return range(4 * D * i + D, 4 * D * i + 2 * D)

    @staticmethod
    def wires_ith_addend(i: int) -> range:
        return range(4 * D * i + 2 * D, 4 * D * i + 3 * D)

    @staticmethod
    def wires_ith_output(i: int) -> range:
        return range(4 * D * i + 3 * D, 4 * D * i + 4 * D)

    def id(self) -> str:
        return f"ArithmeticExtensionGate {{ num_ops: {self.num_ops} }}"

    def eval_unfiltered(self, ops, vars) -> list:
        const_0 = vars.local_constants[0]
        const_1 = vars.local_constants[1]
        constraints = []
        for i in range(self.num_ops):
            m0 = vars.get_local_ext_algebra(self.wires_ith_multiplicand_0(i))
            m1 = vars.get_local_ext_algebra(self.wires_ith_multiplicand_1(i))
            addend = vars.get_local_ext_algebra(self.wires_ith_addend(i))
            output = vars.get_local_ext_algebra(self.wires_ith_output(i))
            computed = ealg_add(
                ops,
                ealg_scalar_mul(ops, const_0, ealg_mul(ops, m0, m1)),
                ealg_scalar_mul(ops, const_1, addend),
            )
            constraints.extend(ealg_sub(ops, output, computed))
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized: the num_ops constraints are independent — one batched
        ext2 mul over a leading [num_ops] axis (same values/order)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        n = self.num_ops
        take = lambda off: jnp.take(
            wires, jnp.asarray(np.arange(off, 4 * D * n, 4 * D, dtype=np.int32)),
            axis=0)
        m0 = (take(0), take(1))
        m1 = (take(2), take(3))
        ad = (take(4), take(5))
        out = (take(6), take(7))
        p = g.ext2_mul(m0, m1)
        c0, c1 = constants[0][None], constants[1][None]
        r0 = g.add(g.mul(c0, p[0]), g.mul(c1, ad[0]))
        r1 = g.add(g.mul(c0, p[1]), g.mul(c1, ad[1]))
        return jnp.stack([g.sub(out[0], r0), g.sub(out[1], r1)], axis=1).reshape(
            D * n, wires.shape[-1])

    def generators(self, row: int, local_constants) -> list:
        return [
            ArithmeticExtensionGenerator(row, local_constants[0], local_constants[1], i)
            for i in range(self.num_ops)
        ]

    def num_wires(self) -> int:
        return self.num_ops * 4 * D

    def num_constants(self) -> int:
        return 2

    def degree(self) -> int:
        return 3

    def num_constraints(self) -> int:
        return self.num_ops * D


class ArithmeticExtensionGenerator(SimpleGenerator):
    def __init__(self, row: int, const_0: int, const_1: int, i: int):
        self.row = row
        self.const_0 = const_0
        self.const_1 = const_1
        self.i = i

    def dependencies(self):
        i = self.i
        return [
            Wire(self.row, w)
            for rng in (
                ArithmeticExtensionGate.wires_ith_multiplicand_0(i),
                ArithmeticExtensionGate.wires_ith_multiplicand_1(i),
                ArithmeticExtensionGate.wires_ith_addend(i),
            )
            for w in rng
        ]

    def outputs(self):
        return [Wire(self.row, w)
                for w in ArithmeticExtensionGate.wires_ith_output(self.i)]

    @classmethod
    def run_batch(cls, gens, witness):
        """Vectorized c0·m0·m1 + c1·addend over every (row, op-slot) in the
        level: numpy ext2 arithmetic, one gather/scatter pair."""
        import numpy as np

        from plonky2_tpu.field import np_field as npf

        n = len(gens)
        rows = np.fromiter((g.row for g in gens), np.int64, n)
        base = np.fromiter((4 * D * g.i for g in gens), np.int64, n)
        c0 = np.fromiter((g.const_0 for g in gens), np.uint64, n)
        c1 = np.fromiter((g.const_1 for g in gens), np.uint64, n)
        get = lambda off: witness.get_reps(witness.wire_reps(rows, base + off))
        m0_0, m0_1 = get(0), get(1)
        m1_0, m1_1 = get(2), get(3)
        ad0, ad1 = get(4), get(5)
        p0, p1 = npf.ext2_mul(m0_0, m0_1, m1_0, m1_1)
        r0 = npf.add(npf.mul(c0, p0), npf.mul(c1, ad0))
        r1 = npf.add(npf.mul(c0, p1), npf.mul(c1, ad1))
        witness.set_reps(
            np.concatenate([witness.wire_reps(rows, base + 6),
                            witness.wire_reps(rows, base + 7)]),
            np.concatenate([r0, r1]))

    def run_once(self, witness, out):
        i, row = self.i, self.row
        ext = lambda rng: tuple(witness.get_target(Wire(row, w)) for w in rng)
        m0 = ext(ArithmeticExtensionGate.wires_ith_multiplicand_0(i))
        m1 = ext(ArithmeticExtensionGate.wires_ith_multiplicand_1(i))
        addend = ext(ArithmeticExtensionGate.wires_ith_addend(i))
        computed = fs.ext_add(
            fs.ext_scalar_mul(self.const_0, fs.ext_mul(m0, m1)),
            fs.ext_scalar_mul(self.const_1, addend),
        )
        out.set_extension_target(
            ExtensionTarget(
                tuple(Wire(row, w) for w in ArithmeticExtensionGate.wires_ith_output(i))
            ),
            computed,
        )


class MulExtensionGate(Gate):
    """const_0 * m0 * m1 over F_{p^D} (reference multiplication_extension.rs)."""

    def __init__(self, num_ops: int):
        self.num_ops = num_ops

    @staticmethod
    def new_from_config(config) -> "MulExtensionGate":
        return MulExtensionGate(config.num_routed_wires // (3 * D))

    @staticmethod
    def wires_ith_multiplicand_0(i: int) -> range:
        return range(3 * D * i, 3 * D * i + D)

    @staticmethod
    def wires_ith_multiplicand_1(i: int) -> range:
        return range(3 * D * i + D, 3 * D * i + 2 * D)

    @staticmethod
    def wires_ith_output(i: int) -> range:
        return range(3 * D * i + 2 * D, 3 * D * i + 3 * D)

    def id(self) -> str:
        return f"MulExtensionGate {{ num_ops: {self.num_ops} }}"

    def eval_unfiltered(self, ops, vars) -> list:
        const_0 = vars.local_constants[0]
        constraints = []
        for i in range(self.num_ops):
            m0 = vars.get_local_ext_algebra(self.wires_ith_multiplicand_0(i))
            m1 = vars.get_local_ext_algebra(self.wires_ith_multiplicand_1(i))
            output = vars.get_local_ext_algebra(self.wires_ith_output(i))
            computed = ealg_scalar_mul(ops, const_0, ealg_mul(ops, m0, m1))
            constraints.extend(ealg_sub(ops, output, computed))
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized (see ArithmeticExtensionGate.eval_unfiltered_device)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        n = self.num_ops
        take = lambda off: jnp.take(
            wires, jnp.asarray(np.arange(off, 3 * D * n, 3 * D, dtype=np.int32)),
            axis=0)
        p = g.ext2_mul((take(0), take(1)), (take(2), take(3)))
        c0 = constants[0][None]
        r0, r1 = g.mul(c0, p[0]), g.mul(c0, p[1])
        return jnp.stack([g.sub(take(4), r0), g.sub(take(5), r1)], axis=1).reshape(
            D * n, wires.shape[-1])

    def generators(self, row: int, local_constants) -> list:
        return [
            MulExtensionGenerator(row, local_constants[0], i) for i in range(self.num_ops)
        ]

    def num_wires(self) -> int:
        return self.num_ops * 3 * D

    def num_constants(self) -> int:
        return 1

    def degree(self) -> int:
        return 3

    def num_constraints(self) -> int:
        return self.num_ops * D


class MulExtensionGenerator(SimpleGenerator):
    def __init__(self, row: int, const_0: int, i: int):
        self.row = row
        self.const_0 = const_0
        self.i = i

    def dependencies(self):
        i = self.i
        return [
            Wire(self.row, w)
            for rng in (
                MulExtensionGate.wires_ith_multiplicand_0(i),
                MulExtensionGate.wires_ith_multiplicand_1(i),
            )
            for w in rng
        ]

    def outputs(self):
        return [Wire(self.row, w)
                for w in MulExtensionGate.wires_ith_output(self.i)]

    @classmethod
    def run_batch(cls, gens, witness):
        """Vectorized c0·m0·m1 over every (row, op-slot) in the level."""
        import numpy as np

        from plonky2_tpu.field import np_field as npf

        n = len(gens)
        rows = np.fromiter((g.row for g in gens), np.int64, n)
        base = np.fromiter((3 * D * g.i for g in gens), np.int64, n)
        c0 = np.fromiter((g.const_0 for g in gens), np.uint64, n)
        get = lambda off: witness.get_reps(witness.wire_reps(rows, base + off))
        p0, p1 = npf.ext2_mul(get(0), get(1), get(2), get(3))
        witness.set_reps(
            np.concatenate([witness.wire_reps(rows, base + 4),
                            witness.wire_reps(rows, base + 5)]),
            np.concatenate([npf.mul(c0, p0), npf.mul(c0, p1)]))

    def run_once(self, witness, out):
        i, row = self.i, self.row
        ext = lambda rng: tuple(witness.get_target(Wire(row, w)) for w in rng)
        m0 = ext(MulExtensionGate.wires_ith_multiplicand_0(i))
        m1 = ext(MulExtensionGate.wires_ith_multiplicand_1(i))
        computed = fs.ext_scalar_mul(self.const_0, fs.ext_mul(m0, m1))
        out.set_extension_target(
            ExtensionTarget(
                tuple(Wire(row, w) for w in MulExtensionGate.wires_ith_output(i))
            ),
            computed,
        )
