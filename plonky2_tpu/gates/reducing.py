"""ReducingGate / ReducingExtensionGate: Horner steps for alpha-reductions
(reference gates/reducing.rs, gates/reducing_extension.rs)."""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.gates.ops import ealg_add, ealg_from_base, ealg_mul, ealg_sub
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import ExtensionTarget, Wire

D = 2


def _ext_target(row, rng):
    return ExtensionTarget(tuple(Wire(row, w) for w in rng))


class ReducingGate(Gate):
    """acc' = acc * alpha + c for base-field coefficients c."""

    def __init__(self, num_coeffs: int):
        self.num_coeffs = num_coeffs

    @staticmethod
    def max_coeffs_len(num_wires: int, num_routed_wires: int) -> int:
        return min(num_routed_wires - 3 * D, (num_wires - 2 * D) // (D + 1))

    @staticmethod
    def wires_output() -> range:
        return range(0, D)

    @staticmethod
    def wires_alpha() -> range:
        return range(D, 2 * D)

    @staticmethod
    def wires_old_acc() -> range:
        return range(2 * D, 3 * D)

    START_COEFFS = 3 * D

    def wires_coeffs(self) -> range:
        return range(self.START_COEFFS, self.START_COEFFS + self.num_coeffs)

    def _start_accs(self) -> int:
        return self.START_COEFFS + self.num_coeffs

    def wires_accs(self, i: int) -> range:
        if i == self.num_coeffs - 1:
            return self.wires_output()
        return range(self._start_accs() + D * i, self._start_accs() + D * (i + 1))

    def id(self) -> str:
        return f"ReducingGate {{ num_coeffs: {self.num_coeffs} }}"

    def eval_unfiltered(self, ops, vars) -> list:
        alpha = vars.get_local_ext_algebra(self.wires_alpha())
        old_acc = vars.get_local_ext_algebra(self.wires_old_acc())
        coeffs = [vars.local_wires[i] for i in self.wires_coeffs()]
        accs = [vars.get_local_ext_algebra(self.wires_accs(i)) for i in range(self.num_coeffs)]

        constraints = []
        acc = old_acc
        for i in range(self.num_coeffs):
            computed = ealg_add(ops, ealg_mul(ops, acc, alpha),
                                ealg_from_base(ops, coeffs[i], D))
            constraints.extend(ealg_sub(ops, computed, accs[i]))
            acc = accs[i]
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized: each Horner step reads its accumulator from witness
        wires, so the num_coeffs constraints are independent — one batched
        ext2 mul over a leading [num_coeffs] axis instead of an unrolled
        chain (same values/order as eval_unfiltered)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        n = self.num_coeffs
        sa = self._start_accs()
        take = lambda rows: jnp.take(
            wires, jnp.asarray(np.asarray(rows, np.int32)), axis=0)
        prev0 = take([2 * D] + [sa + D * i for i in range(n - 1)])
        prev1 = take([2 * D + 1] + [sa + D * i + 1 for i in range(n - 1)])
        out0 = take([sa + D * i for i in range(n - 1)] + [0])
        out1 = take([sa + D * i + 1 for i in range(n - 1)] + [1])
        coeffs = take(list(self.wires_coeffs()))
        c0, c1 = g.ext2_mul((prev0, prev1), (wires[D][None], wires[D + 1][None]))
        c0 = g.add(c0, coeffs)
        return jnp.stack([g.sub(c0, out0), g.sub(c1, out1)], axis=1).reshape(
            D * n, wires.shape[-1])

    def generators(self, row: int, local_constants) -> list:
        return [ReducingGenerator(row, self.num_coeffs)]

    def num_wires(self) -> int:
        return 2 * D + self.num_coeffs * (D + 1)

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 2

    def num_constraints(self) -> int:
        return D * self.num_coeffs


class ReducingGenerator(SimpleGenerator):
    BATCH_MIN = 2

    def __init__(self, row: int, num_coeffs: int):
        self.row = row
        self.num_coeffs = num_coeffs

    def _gate(self):
        return ReducingGate(self.num_coeffs)

    def dependencies(self):
        gate = self._gate()
        cols = list(gate.wires_alpha()) + list(gate.wires_old_acc()) + list(gate.wires_coeffs())
        return [Wire(self.row, c) for c in cols]

    def outputs(self):
        gate = self._gate()
        cols = []
        for i in range(gate.num_coeffs):
            cols += list(gate.wires_accs(i))
        cols += list(gate.wires_output())
        return [Wire(self.row, c) for c in cols]


    @classmethod
    def run_batch(cls, gens, witness):
        """Vectorized over rows grouped by num_coeffs: numpy ext2 Horner
        chain, one set_reps write per wire column group."""
        import numpy as np

        from plonky2_tpu.field import np_field as npf

        by_n: dict[int, list] = {}
        for g in gens:
            by_n.setdefault(g.num_coeffs, []).append(g)
        for num_coeffs, group in by_n.items():
            gate = ReducingGate(num_coeffs)
            n = len(group)
            rows = np.fromiter((g.row for g in group), np.int64, n)
            getc = lambda col: witness.get_reps(witness.wire_reps(rows, col))
            wa = list(gate.wires_alpha())
            wo = list(gate.wires_old_acc())
            a0, a1 = getc(wa[0]), getc(wa[1])
            acc0, acc1 = getc(wo[0]), getc(wo[1])
            coeff_cols = list(gate.wires_coeffs())
            reps, vals = [], []
            for i in range(num_coeffs):
                c = getc(coeff_cols[i])
                acc0, acc1 = npf.ext2_mul(acc0, acc1, a0, a1)
                acc0 = npf.add(acc0, c)
                wacc = list(gate.wires_accs(i))
                reps += [witness.wire_reps(rows, wacc[0]), witness.wire_reps(rows, wacc[1])]
                vals += [acc0, acc1]
            wout = list(gate.wires_output())
            reps += [witness.wire_reps(rows, wout[0]), witness.wire_reps(rows, wout[1])]
            vals += [acc0, acc1]
            witness.set_reps(np.concatenate(reps), np.concatenate(vals))

    def run_once(self, witness, out):
        gate = self._gate()
        row = self.row
        ext = lambda rng: tuple(witness.get_target(Wire(row, w)) for w in rng)
        alpha = ext(gate.wires_alpha())
        acc = ext(gate.wires_old_acc())
        coeffs = [witness.get_target(Wire(row, i)) for i in gate.wires_coeffs()]
        for i in range(gate.num_coeffs):
            acc = fs.ext_add(fs.ext_mul(acc, alpha), fs.ext_from_base(coeffs[i], D))
            out.set_extension_target(_ext_target(row, gate.wires_accs(i)), acc)
        out.set_extension_target(_ext_target(row, gate.wires_output()), acc)


class ReducingExtensionGate(Gate):
    """acc' = acc * alpha + c for extension-field coefficients c."""

    def __init__(self, num_coeffs: int):
        self.num_coeffs = num_coeffs

    @staticmethod
    def max_coeffs_len(num_wires: int, num_routed_wires: int) -> int:
        return min((num_routed_wires - 3 * D) // D, (num_wires - 2 * D) // (2 * D))

    wires_output = staticmethod(ReducingGate.wires_output)
    wires_alpha = staticmethod(ReducingGate.wires_alpha)
    wires_old_acc = staticmethod(ReducingGate.wires_old_acc)
    START_COEFFS = 3 * D

    @staticmethod
    def wires_coeff(i: int) -> range:
        return range(ReducingExtensionGate.START_COEFFS + i * D,
                     ReducingExtensionGate.START_COEFFS + (i + 1) * D)

    def _start_accs(self) -> int:
        return self.START_COEFFS + self.num_coeffs * D

    def wires_accs(self, i: int) -> range:
        if i == self.num_coeffs - 1:
            return self.wires_output()
        return range(self._start_accs() + D * i, self._start_accs() + D * (i + 1))

    def id(self) -> str:
        return f"ReducingExtensionGate {{ num_coeffs: {self.num_coeffs} }}"

    def eval_unfiltered(self, ops, vars) -> list:
        alpha = vars.get_local_ext_algebra(self.wires_alpha())
        old_acc = vars.get_local_ext_algebra(self.wires_old_acc())
        coeffs = [vars.get_local_ext_algebra(self.wires_coeff(i)) for i in range(self.num_coeffs)]
        accs = [vars.get_local_ext_algebra(self.wires_accs(i)) for i in range(self.num_coeffs)]

        constraints = []
        acc = old_acc
        for i in range(self.num_coeffs):
            computed = ealg_add(ops, ealg_mul(ops, acc, alpha), coeffs[i])
            constraints.extend(ealg_sub(ops, computed, accs[i]))
            acc = accs[i]
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized (see ReducingGate.eval_unfiltered_device)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        n = self.num_coeffs
        sa = self._start_accs()
        sc = self.START_COEFFS
        take = lambda rows: jnp.take(
            wires, jnp.asarray(np.asarray(rows, np.int32)), axis=0)
        prev0 = take([2 * D] + [sa + D * i for i in range(n - 1)])
        prev1 = take([2 * D + 1] + [sa + D * i + 1 for i in range(n - 1)])
        out0 = take([sa + D * i for i in range(n - 1)] + [0])
        out1 = take([sa + D * i + 1 for i in range(n - 1)] + [1])
        co0 = take([sc + D * i for i in range(n)])
        co1 = take([sc + D * i + 1 for i in range(n)])
        c0, c1 = g.ext2_mul((prev0, prev1), (wires[D][None], wires[D + 1][None]))
        c0, c1 = g.add(c0, co0), g.add(c1, co1)
        return jnp.stack([g.sub(c0, out0), g.sub(c1, out1)], axis=1).reshape(
            D * n, wires.shape[-1])

    def generators(self, row: int, local_constants) -> list:
        return [ReducingExtensionGenerator(row, self.num_coeffs)]

    def num_wires(self) -> int:
        return 2 * D + 2 * D * self.num_coeffs

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 2

    def num_constraints(self) -> int:
        return D * self.num_coeffs


class ReducingExtensionGenerator(SimpleGenerator):
    BATCH_MIN = 2

    def __init__(self, row: int, num_coeffs: int):
        self.row = row
        self.num_coeffs = num_coeffs

    def _gate(self):
        return ReducingExtensionGate(self.num_coeffs)

    def dependencies(self):
        gate = self._gate()
        cols = list(gate.wires_alpha()) + list(gate.wires_old_acc())
        for i in range(gate.num_coeffs):
            cols += list(gate.wires_coeff(i))
        return [Wire(self.row, c) for c in cols]

    def outputs(self):
        gate = self._gate()
        cols = []
        for i in range(gate.num_coeffs):
            cols += list(gate.wires_accs(i))
        cols += list(gate.wires_output())
        return [Wire(self.row, c) for c in cols]


    @classmethod
    def run_batch(cls, gens, witness):
        """Vectorized over rows grouped by num_coeffs (extension coeffs)."""
        import numpy as np

        from plonky2_tpu.field import np_field as npf

        by_n: dict[int, list] = {}
        for g in gens:
            by_n.setdefault(g.num_coeffs, []).append(g)
        for num_coeffs, group in by_n.items():
            gate = ReducingExtensionGate(num_coeffs)
            n = len(group)
            rows = np.fromiter((g.row for g in group), np.int64, n)
            getc = lambda col: witness.get_reps(witness.wire_reps(rows, col))
            wa = list(gate.wires_alpha())
            wo = list(gate.wires_old_acc())
            a0, a1 = getc(wa[0]), getc(wa[1])
            acc0, acc1 = getc(wo[0]), getc(wo[1])
            reps, vals = [], []
            for i in range(num_coeffs):
                wc = list(gate.wires_coeff(i))
                c0, c1 = getc(wc[0]), getc(wc[1])
                acc0, acc1 = npf.ext2_mul(acc0, acc1, a0, a1)
                acc0, acc1 = npf.ext2_add(acc0, acc1, c0, c1)
                wacc = list(gate.wires_accs(i))
                reps += [witness.wire_reps(rows, wacc[0]), witness.wire_reps(rows, wacc[1])]
                vals += [acc0, acc1]
            wout = list(gate.wires_output())
            reps += [witness.wire_reps(rows, wout[0]), witness.wire_reps(rows, wout[1])]
            vals += [acc0, acc1]
            witness.set_reps(np.concatenate(reps), np.concatenate(vals))

    def run_once(self, witness, out):
        gate = self._gate()
        row = self.row
        ext = lambda rng: tuple(witness.get_target(Wire(row, w)) for w in rng)
        alpha = ext(gate.wires_alpha())
        acc = ext(gate.wires_old_acc())
        for i in range(gate.num_coeffs):
            acc = fs.ext_add(fs.ext_mul(acc, alpha), ext(gate.wires_coeff(i)))
            out.set_extension_target(_ext_target(row, gate.wires_accs(i)), acc)
        out.set_extension_target(_ext_target(row, gate.wires_output()), acc)
