"""Gate base class (reference gates/gate.rs:53-254).

A custom gate defines its constraint polynomials once over the generic ops
protocol (see gates/ops.py); the framework derives verifier-at-zeta, batched
device, and (for recursion) in-circuit evaluation from the same definition.
"""

from __future__ import annotations


class Gate:
    def id(self) -> str:
        raise NotImplementedError

    def eval_unfiltered(self, ops, vars) -> list:
        """Constraint values in canonical order."""
        raise NotImplementedError

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Batched device evaluation over the whole quotient domain.

        wires: [num_config_wires, Q] u64; constants: [num_gate_constants, Q]
        (selector columns already stripped); public_inputs_hash: [4] u64.
        Returns [num_constraints, Q] in the SAME order as eval_unfiltered.

        Default: instantiate the generic ops definition row-wise. Hot gates
        (Poseidon) override with a tensorized form — same math, ~100x fewer
        XLA primitives, which keeps lowering/compile time sane.
        """
        import jax.numpy as jnp

        from plonky2_tpu.gates.ops import DeviceBaseOps, EvaluationVars

        ops = DeviceBaseOps()
        vars = EvaluationVars(
            [constants[i] for i in range(constants.shape[0])],
            [wires[i] for i in range(wires.shape[0])],
            [public_inputs_hash[k] for k in range(4)],
        )
        cs = self.eval_unfiltered(ops, vars)
        q = wires.shape[-1]
        if not cs:
            return jnp.zeros((0, q), dtype=jnp.uint64)
        return jnp.stack([jnp.broadcast_to(c, (q,)) for c in cs])

    def generators(self, row: int, local_constants: list[int]) -> list:
        return []

    def num_wires(self) -> int:
        raise NotImplementedError

    def num_constants(self) -> int:
        raise NotImplementedError

    def degree(self) -> int:
        raise NotImplementedError

    def num_constraints(self) -> int:
        raise NotImplementedError

    def extra_constant_wires(self) -> list[tuple[int, int]]:
        """(constant_index, wire_index) pairs routed as extra constants."""
        return []

    def __eq__(self, other):
        return isinstance(other, Gate) and self.id() == other.id()

    def __hash__(self):
        return hash(self.id())


UNUSED_SELECTOR = (1 << 32) - 1  # u32::MAX (reference gates/selectors.rs:14)


def compute_filter(ops, row: int, group: range, s, many_selectors: bool):
    """Product over the selector group excluding `row`
    (reference gates/gate.rs:326-338)."""
    acc = ops.one()
    for i in group:
        if i == row:
            continue
        acc = ops.mul(acc, ops.sub(ops.constant(i), s))
    if many_selectors:
        acc = ops.mul(acc, ops.sub(ops.constant(UNUSED_SELECTOR), s))
    return acc
