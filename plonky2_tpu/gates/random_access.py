"""RandomAccessGate: in-circuit array indexing via bit-decomposed index
(reference gates/random_access.rs)."""

from __future__ import annotations

from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import Wire


class RandomAccessGate(Gate):
    def __init__(self, bits: int, num_copies: int, num_extra_constants: int):
        self.bits = bits
        self.num_copies = num_copies
        self.num_extra_constants = num_extra_constants

    @staticmethod
    def new_from_config(config, bits: int) -> "RandomAccessGate":
        vec_size = 1 << bits
        max_copies = min(
            config.num_routed_wires // (2 + vec_size),
            config.num_wires // (2 + vec_size + bits),
        )
        max_extra_constants = config.num_routed_wires - (2 + vec_size) * max_copies
        return RandomAccessGate(
            bits, max_copies, min(max_extra_constants, config.num_constants)
        )

    @property
    def num_ops(self) -> int:
        """Slot count for find_slot batching (one copy per slot)."""
        return self.num_copies

    def vec_size(self) -> int:
        return 1 << self.bits

    def wire_access_index(self, copy: int) -> int:
        return (2 + self.vec_size()) * copy

    def wire_claimed_element(self, copy: int) -> int:
        return (2 + self.vec_size()) * copy + 1

    def wire_list_item(self, i: int, copy: int) -> int:
        return (2 + self.vec_size()) * copy + 2 + i

    def _start_extra_constants(self) -> int:
        return (2 + self.vec_size()) * self.num_copies

    def wire_extra_constant(self, i: int) -> int:
        return self._start_extra_constants() + i

    def num_routed_wires_used(self) -> int:
        return self._start_extra_constants() + self.num_extra_constants

    def wire_bit(self, i: int, copy: int) -> int:
        return self.num_routed_wires_used() + copy * self.bits + i

    def id(self) -> str:
        return (
            f"RandomAccessGate {{ bits: {self.bits}, num_copies: {self.num_copies}, "
            f"num_extra_constants: {self.num_extra_constants} }}<D=2>"
        )

    def eval_unfiltered(self, ops, vars) -> list:
        constraints = []
        for copy in range(self.num_copies):
            access_index = vars.local_wires[self.wire_access_index(copy)]
            list_items = [
                vars.local_wires[self.wire_list_item(i, copy)]
                for i in range(self.vec_size())
            ]
            claimed = vars.local_wires[self.wire_claimed_element(copy)]
            bits = [vars.local_wires[self.wire_bit(i, copy)] for i in range(self.bits)]

            for b in bits:
                constraints.append(ops.mul(b, ops.sub(b, ops.one())))

            reconstructed = ops.zero()
            for b in reversed(bits):
                reconstructed = ops.add(ops.add(reconstructed, reconstructed), b)
            constraints.append(ops.sub(reconstructed, access_index))

            for b in bits:
                list_items = [
                    ops.add(x, ops.mul(b, ops.sub(y, x)))
                    for x, y in zip(list_items[::2], list_items[1::2])
                ]
            assert len(list_items) == 1
            constraints.append(ops.sub(list_items[0], claimed))

        for i in range(self.num_extra_constants):
            constraints.append(
                ops.sub(vars.local_constants[i],
                        vars.local_wires[self.wire_extra_constant(i)])
            )
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized over the [num_copies] axis; the bit-select tree runs
        once on [copies, vec, Q] (same values/order as eval_unfiltered)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        C, B, V = self.num_copies, self.bits, self.vec_size()
        Q = wires.shape[-1]
        take = lambda rows: jnp.take(
            wires, jnp.asarray(np.asarray(rows, np.int32)), axis=0)
        idx = take([self.wire_access_index(c) for c in range(C)])  # [C, Q]
        claimed = take([self.wire_claimed_element(c) for c in range(C)])
        items = take([self.wire_list_item(i, c)
                      for c in range(C) for i in range(V)]).reshape(C, V, Q)
        bits = take([self.wire_bit(i, c)
                     for c in range(C) for i in range(B)]).reshape(C, B, Q)

        one = jnp.ones((), dtype=jnp.uint64)
        bit_checks = g.mul(bits, g.sub(bits, one))  # [C, B, Q]

        recon = jnp.zeros((C, Q), dtype=jnp.uint64)
        for i in range(B - 1, -1, -1):
            recon = g.add(g.add(recon, recon), bits[:, i])
        recon_c = g.sub(recon, idx)[:, None]  # [C, 1, Q]

        sel = items
        for i in range(B):
            x, y = sel[:, ::2], sel[:, 1::2]
            sel = g.add(x, g.mul(bits[:, i:i + 1], g.sub(y, x)))
        sel_c = g.sub(sel[:, 0], claimed)[:, None]  # [C, 1, Q]

        per_copy = jnp.concatenate([bit_checks, recon_c, sel_c], axis=1)
        out = [per_copy.reshape(C * (B + 2), Q)]
        if self.num_extra_constants:
            extras = take([self.wire_extra_constant(i)
                           for i in range(self.num_extra_constants)])
            out.append(g.sub(constants[:self.num_extra_constants], extras))
        return jnp.concatenate(out, axis=0)

    def generators(self, row: int, local_constants) -> list:
        return [
            RandomAccessGenerator(row, self.bits, self.num_copies,
                                  self.num_extra_constants, copy)
            for copy in range(self.num_copies)
        ]

    def extra_constant_wires(self) -> list[tuple[int, int]]:
        return [(i, self.wire_extra_constant(i)) for i in range(self.num_extra_constants)]

    def num_wires(self) -> int:
        return self.wire_bit(self.bits - 1, self.num_copies - 1) + 1

    def num_constants(self) -> int:
        return self.num_extra_constants

    def degree(self) -> int:
        return self.bits + 1

    def num_constraints(self) -> int:
        return self.num_copies * (self.bits + 2) + self.num_extra_constants


class RandomAccessGenerator(SimpleGenerator):
    def __init__(self, row, bits, num_copies, num_extra_constants, copy):
        self.row = row
        self.bits = bits
        self.num_copies = num_copies
        self.num_extra_constants = num_extra_constants
        self.copy = copy

    def _gate(self) -> RandomAccessGate:
        return RandomAccessGate(self.bits, self.num_copies, self.num_extra_constants)

    def dependencies(self):
        gate = self._gate()
        return [Wire(self.row, gate.wire_access_index(self.copy))] + [
            Wire(self.row, gate.wire_list_item(i, self.copy))
            for i in range(gate.vec_size())
        ]

    def outputs(self):
        gate = self._gate()
        return [Wire(self.row, gate.wire_claimed_element(self.copy))] + [
            Wire(self.row, gate.wire_bit(i, self.copy)) for i in range(gate.bits)
        ]

    def run_once(self, witness, out):
        gate = self._gate()
        row, copy = self.row, self.copy
        access_index = witness.get_target(Wire(row, gate.wire_access_index(copy)))
        vec_size = gate.vec_size()
        assert access_index < vec_size, (
            f"Access index {access_index} is larger than the vector size {vec_size}"
        )
        out.set_target(
            Wire(row, gate.wire_claimed_element(copy)),
            witness.get_target(Wire(row, gate.wire_list_item(access_index, copy))),
        )
        for i in range(gate.bits):
            out.set_target(Wire(row, gate.wire_bit(i, copy)), (access_index >> i) & 1)

    @classmethod
    def run_batch(cls, gens, witness):
        """Vectorized gather + bit decomposition for a whole level (the
        scalar path paid a Python Wire/rep lookup per list item)."""
        import numpy as np

        by_shape: dict[tuple, list] = {}
        for g in gens:
            by_shape.setdefault((g.bits, g.num_copies, g.num_extra_constants),
                                []).append(g)
        for (bits, num_copies, nec), gs in by_shape.items():
            gate = RandomAccessGate(bits, num_copies, nec)
            vec_size = gate.vec_size()
            n = len(gs)
            rows = np.fromiter((g.row for g in gs), np.int64, n)
            copies = np.fromiter((g.copy for g in gs), np.int64, n)
            idx_cols = np.fromiter(
                (gate.wire_access_index(g.copy) for g in gs), np.int64, n)
            aidx = witness.get_reps(
                witness.wire_reps(rows, idx_cols)).astype(np.int64)
            assert (aidx < vec_size).all(), (
                f"Access index larger than the vector size {vec_size}")
            item_cols = np.fromiter(
                (gate.wire_list_item(int(a), int(c))
                 for a, c in zip(aidx, copies)), np.int64, n)
            claimed = witness.get_reps(witness.wire_reps(rows, item_cols))
            out_cols = np.empty((n, 1 + bits), np.int64)
            out_vals = np.empty((n, 1 + bits), np.uint64)
            out_cols[:, 0] = np.fromiter(
                (gate.wire_claimed_element(g.copy) for g in gs), np.int64, n)
            out_vals[:, 0] = claimed
            for i in range(bits):
                out_cols[:, 1 + i] = np.fromiter(
                    (gate.wire_bit(i, g.copy) for g in gs), np.int64, n)
                out_vals[:, 1 + i] = (aidx >> i) & 1
            reps = witness.wire_reps(rows[:, None], out_cols)
            witness.set_reps(reps.reshape(-1), out_vals.reshape(-1))
