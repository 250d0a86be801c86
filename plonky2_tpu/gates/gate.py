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
