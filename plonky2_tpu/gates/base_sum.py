"""BaseSumGate: base-B little-endian limb decomposition with range checks
(reference gates/base_sum.rs)."""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import Wire


class BaseSumGate(Gate):
    WIRE_SUM = 0
    START_LIMBS = 1

    def __init__(self, num_limbs: int, base: int):
        self.num_limbs = num_limbs
        self.base = base

    @staticmethod
    def new_from_config(config, base: int) -> "BaseSumGate":
        # log_floor(ORDER - 1, base), capped by routed wires
        num_limbs = 0
        v = fs.P - 1
        while v >= base:
            v //= base
            num_limbs += 1
        return BaseSumGate(
            min(num_limbs, config.num_routed_wires - BaseSumGate.START_LIMBS), base
        )

    def limbs(self) -> range:
        return range(self.START_LIMBS, self.START_LIMBS + self.num_limbs)

    def id(self) -> str:
        return f"BaseSumGate {{ num_limbs: {self.num_limbs} }} + Base: {self.base}"

    def eval_unfiltered(self, ops, vars) -> list:
        total = vars.local_wires[self.WIRE_SUM]
        limbs = [vars.local_wires[i] for i in self.limbs()]
        computed = ops.zero()
        for limb in reversed(limbs):
            computed = ops.add(ops.mul_const(self.base, computed), limb)
        constraints = [ops.sub(computed, total)]
        for limb in limbs:
            acc = limb  # prod_{i<B} (limb - i); first factor is (limb - 0)
            for i in range(1, self.base):
                acc = ops.mul(acc, ops.add_const(limb, -i))
            constraints.append(acc)
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized: weighted sum as one modular dot product, range checks
        batched over the [num_limbs] axis (same values/order)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g
        from plonky2_tpu.field import scalar as fs

        limbs = wires[self.START_LIMBS:self.START_LIMBS + self.num_limbs]
        pows = jnp.asarray(g.np_powers(self.base % fs.P, self.num_limbs))
        computed = g.sum_mod(g.mul(pows[:, None], limbs), axis=0)
        sum_c = g.sub(computed, wires[self.WIRE_SUM])
        acc = limbs
        for i in range(1, self.base):
            acc = g.mul(acc, g.sub(limbs, jnp.asarray(np.uint64(i % fs.P))))
        return jnp.concatenate([sum_c[None], acc], axis=0)

    def generators(self, row: int, local_constants) -> list:
        return [BaseSplitGenerator(row, self.num_limbs, self.base)]

    def num_wires(self) -> int:
        return 1 + self.num_limbs

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return self.base

    def num_constraints(self) -> int:
        return 1 + self.num_limbs


class BaseSplitGenerator(SimpleGenerator):
    def __init__(self, row: int, num_limbs: int, base: int):
        self.row = row
        self.num_limbs = num_limbs
        self.base = base

    def dependencies(self):
        return [Wire(self.row, BaseSumGate.WIRE_SUM)]

    def outputs(self):
        return [Wire(self.row, BaseSumGate.START_LIMBS + i)
                for i in range(self.num_limbs)]

    def run_once(self, witness, out):
        sum_value = witness.get_target(Wire(self.row, BaseSumGate.WIRE_SUM))
        limbs = []
        v = sum_value
        for _ in range(self.num_limbs):
            limbs.append(v % self.base)
            v //= self.base
        if v != 0:
            raise ValueError(
                f"Integer {sum_value} too large for {self.num_limbs} limbs of base {self.base}"
            )
        for i, limb in enumerate(limbs):
            out.set_target(Wire(self.row, BaseSumGate.START_LIMBS + i), limb)

    @classmethod
    def run_batch(cls, gens, witness):
        """Vectorized base-B decomposition for a whole level (u64 sums fit
        numpy; the per-row Python divmod loop dominated otherwise)."""
        import numpy as np

        by_shape: dict[tuple, list] = {}
        for g in gens:
            by_shape.setdefault((g.num_limbs, g.base), []).append(g)
        for (num_limbs, base), gs in by_shape.items():
            n = len(gs)
            rows = np.fromiter((g.row for g in gs), np.int64, n)
            sums = witness.get_reps(witness.wire_reps(rows, BaseSumGate.WIRE_SUM))
            v = sums.copy()
            limbs = np.empty((n, num_limbs), np.uint64)
            b = np.uint64(base)
            for i in range(num_limbs):
                limbs[:, i] = v % b
                v //= b
            if (v != 0).any():
                k = int(np.nonzero(v)[0][0])
                raise ValueError(
                    f"Integer {int(sums[k])} too large for {num_limbs} limbs "
                    f"of base {base}"
                )
            cols = np.arange(BaseSumGate.START_LIMBS,
                             BaseSumGate.START_LIMBS + num_limbs, dtype=np.int64)
            reps = witness.wire_reps(rows[:, None], cols[None, :])
            witness.set_reps(reps.reshape(-1), limbs.reshape(-1))
