"""NoopGate, ConstantGate, PublicInputGate
(reference gates/noop.rs, gates/constant.rs, gates/public_input.rs)."""

from __future__ import annotations

from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.iop.generator import ConstantGenerator


class NoopGate(Gate):
    def id(self) -> str:
        return "NoopGate"

    def eval_unfiltered(self, ops, vars) -> list:
        return []

    def num_wires(self) -> int:
        return 0

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 0

    def num_constraints(self) -> int:
        return 0


class ConstantGate(Gate):
    """Routes `num_consts` gate constants to routable wires."""

    def __init__(self, num_consts: int):
        self.num_consts = num_consts

    def id(self) -> str:
        return f"ConstantGate {{ num_consts: {self.num_consts} }}"

    def const_input(self, i: int) -> int:
        assert i < self.num_consts
        return i

    def wire_output(self, i: int) -> int:
        assert i < self.num_consts
        return i

    def eval_unfiltered(self, ops, vars) -> list:
        return [
            ops.sub(vars.local_constants[self.const_input(i)],
                    vars.local_wires[self.wire_output(i)])
            for i in range(self.num_consts)
        ]

    def generators(self, row: int, local_constants: list[int]) -> list:
        # ConstantGenerators for this gate are registered via
        # extra_constant_wires at add_gate time (reference constant.rs:113).
        return []

    def extra_constant_wires(self) -> list[tuple[int, int]]:
        return [(i, self.wire_output(i)) for i in range(self.num_consts)]

    def num_wires(self) -> int:
        return self.num_consts

    def num_constants(self) -> int:
        return self.num_consts

    def degree(self) -> int:
        return 1

    def num_constraints(self) -> int:
        return self.num_consts


class PublicInputGate(Gate):
    """Pins the 4 public-input-hash felts to wires 0..4."""

    def id(self) -> str:
        return "PublicInputGate"

    @staticmethod
    def wires_public_inputs_hash() -> range:
        return range(4)

    def eval_unfiltered(self, ops, vars) -> list:
        # public_inputs_hash entries are pre-lifted ops-domain values
        return [
            ops.sub(vars.local_wires[w], h)
            for w, h in zip(self.wires_public_inputs_hash(), vars.public_inputs_hash)
        ]

    def num_wires(self) -> int:
        return 4

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 1

    def num_constraints(self) -> int:
        return 4
