"""LookupGate and LookupTableGate (reference gates/lookup.rs,
gates/lookup_table.rs).

Neither gate has main-trace constraints; the lookup argument lives in the
RE/partial-SLDC polynomials (plonk/prover.py) and their vanishing-poly checks
(plonk/vanishing_poly.py). LUTs are lists of (u16 input, u16 output) pairs.
"""

from __future__ import annotations

from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.hash.keccak import keccak256
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import Wire

LookupTable = list  # list[(int, int)] with u16 entries


def _lut_hash(lut) -> bytes:
    data = b"".join(
        int(i).to_bytes(2, "little") + int(o).to_bytes(2, "little") for i, o in lut
    )
    return keccak256(data)


class LookupGate(Gate):
    """Stores (input, output) lookup pairs made elsewhere in the trace."""

    def __init__(self, num_slots: int, lut):
        self.num_slots = num_slots
        self.lut = lut
        self.lut_hash = _lut_hash(lut)

    @staticmethod
    def new_from_table(config, lut) -> "LookupGate":
        return LookupGate(LookupGate.num_slots_from_config(config), lut)

    @staticmethod
    def num_slots_from_config(config) -> int:
        return config.num_routed_wires // 2

    @property
    def num_ops(self) -> int:
        return self.num_slots

    @staticmethod
    def wire_ith_looking_inp(i: int) -> int:
        return 2 * i

    @staticmethod
    def wire_ith_looking_out(i: int) -> int:
        return 2 * i + 1

    def id(self) -> str:
        return f"LookupGate {{num_slots: {self.num_slots}, lut_hash: {self.lut_hash.hex()}}}"

    def eval_unfiltered(self, ops, vars) -> list:
        return []

    def generators(self, row: int, local_constants) -> list:
        return [LookupGenerator(row, self.lut, i) for i in range(self.num_slots)]

    def num_wires(self) -> int:
        return self.num_slots * 2

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 0

    def num_constraints(self) -> int:
        return 0


class LookupGenerator(SimpleGenerator):
    def __init__(self, row, lut, slot_nb):
        self.row = row
        self.lut = lut
        self.slot_nb = slot_nb

    def dependencies(self):
        return [Wire(self.row, LookupGate.wire_ith_looking_inp(self.slot_nb))]

    def outputs(self):
        return [Wire(self.row, LookupGate.wire_ith_looking_out(self.slot_nb))]

    def run_once(self, witness, out):
        inp = witness.get_target(Wire(self.row, LookupGate.wire_ith_looking_inp(self.slot_nb)))
        out_wire = Wire(self.row, LookupGate.wire_ith_looking_out(self.slot_nb))
        if inp < len(self.lut) and inp == self.lut[inp][0]:
            out.set_target(out_wire, self.lut[inp][1])
            return
        for i, o in self.lut:
            if inp == i:
                out.set_target(out_wire, o)
                return
        raise ValueError("Incorrect input value provided")


class LookupTableGate(Gate):
    """Stores the LUT's (input, output) pairs and their multiplicities."""

    def __init__(self, num_slots: int, lut, last_lut_row: int):
        self.num_slots = num_slots
        self.lut = lut
        self.lut_hash = _lut_hash(lut)
        self.last_lut_row = last_lut_row

    @staticmethod
    def new_from_table(config, lut, last_lut_row: int) -> "LookupTableGate":
        return LookupTableGate(
            LookupTableGate.num_slots_from_config(config), lut, last_lut_row
        )

    @staticmethod
    def num_slots_from_config(config) -> int:
        return config.num_routed_wires // 3

    @staticmethod
    def wire_ith_looked_inp(i: int) -> int:
        return 3 * i

    @staticmethod
    def wire_ith_looked_out(i: int) -> int:
        return 3 * i + 1

    @staticmethod
    def wire_ith_multiplicity(i: int) -> int:
        return 3 * i + 2

    def id(self) -> str:
        return (
            f"LookupTableGate {{num_slots: {self.num_slots}, "
            f"lut_hash: {self.lut_hash.hex()}, last_lut_row: {self.last_lut_row}}}"
        )

    def eval_unfiltered(self, ops, vars) -> list:
        return []

    def generators(self, row: int, local_constants) -> list:
        return [
            LookupTableGenerator(row, self.lut, i, self.num_slots, self.last_lut_row)
            for i in range(self.num_slots)
        ]

    def num_wires(self) -> int:
        return self.num_slots * 3

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 0

    def num_constraints(self) -> int:
        return 0


class LookupTableGenerator(SimpleGenerator):
    def __init__(self, row, lut, slot_nb, num_slots, last_lut_row):
        self.row = row
        self.lut = lut
        self.slot_nb = slot_nb
        self.num_slots = num_slots
        self.last_lut_row = last_lut_row

    def dependencies(self):
        return []

    def outputs(self):
        return [
            Wire(self.row, LookupTableGate.wire_ith_looked_inp(self.slot_nb)),
            Wire(self.row, LookupTableGate.wire_ith_looked_out(self.slot_nb)),
        ]

    def run_once(self, witness, out):
        first_row = self.last_lut_row + (len(self.lut) + self.num_slots - 1) // self.num_slots - 1
        slot = (first_row - self.row) * self.num_slots + self.slot_nb
        inp_t = Wire(self.row, LookupTableGate.wire_ith_looked_inp(self.slot_nb))
        out_t = Wire(self.row, LookupTableGate.wire_ith_looked_out(self.slot_nb))
        if slot < len(self.lut):
            i, o = self.lut[slot]
        else:
            assert self.lut, "Empty LUTs are not supported."
            i, o = self.lut[0]  # pad with first element
        out.set_target(inp_t, i)
        out.set_target(out_t, o)
