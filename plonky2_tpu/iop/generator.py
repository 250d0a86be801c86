"""Witness generators + worklist scheduler (reference iop/generator.rs).

Witness generation is an inherently sequential, data-dependent dependency
graph — the wrong shape for the TPU — so it runs host-side. Generators fire
once all their dependency targets have values; newly-set targets wake the
generators watching them (watch lists keyed by partition representative).
"""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.iop.target import Target
from plonky2_tpu.iop.witness import PartialWitness, PartitionWitness


class GeneratedValues:
    def __init__(self):
        self.target_values: list[tuple[Target, int]] = []

    def set_target(self, target: Target, value: int) -> None:
        self.target_values.append((target, value))

    def set_extension_target(self, ext_target, value: tuple) -> None:
        for t, v in zip(ext_target.parts, value):
            self.set_target(t, v)

    def set_bool_target(self, bool_target, value: bool) -> None:
        self.set_target(bool_target.target, 1 if value else 0)


class SimpleGenerator:
    """Deps known upfront; runs once when all deps are set
    (reference iop/generator.rs:206-234)."""

    def id(self) -> str:
        return type(self).__name__

    def dependencies(self) -> list[Target]:
        raise NotImplementedError

    def run_once(self, witness: PartitionWitness, out_buffer: GeneratedValues) -> None:
        raise NotImplementedError


class ConstantGenerator(SimpleGenerator):
    def __init__(self, row: int, constant_index: int, wire_index: int, constant: int):
        self.row = row
        self.constant_index = constant_index
        self.wire_index = wire_index
        self.constant = constant

    def dependencies(self):
        return []

    def run_once(self, witness, out_buffer):
        from plonky2_tpu.iop.target import Wire

        out_buffer.set_target(Wire(self.row, self.wire_index), self.constant)


class CopyGenerator(SimpleGenerator):
    def __init__(self, src: Target, dst: Target):
        self.src = src
        self.dst = dst

    def dependencies(self):
        return [self.src]

    def run_once(self, witness, out_buffer):
        out_buffer.set_target(self.dst, witness.get_target(self.src))


class RandomValueGenerator(SimpleGenerator):
    def __init__(self, target: Target):
        self.target = target

    def dependencies(self):
        return []

    def run_once(self, witness, out_buffer):
        import random

        out_buffer.set_target(self.target, random.randrange(fs.P))


class NonzeroTestGenerator(SimpleGenerator):
    def __init__(self, to_test: Target, dummy: Target):
        self.to_test = to_test
        self.dummy = dummy

    def dependencies(self):
        return [self.to_test]

    def run_once(self, witness, out_buffer):
        v = witness.get_target(self.to_test)
        out_buffer.set_target(self.dummy, fs.inverse(v) if v != 0 else 1)


class ArithmeticBaseGenerator(SimpleGenerator):
    """Generator for one op slot of ArithmeticGate (fills the output wire)."""

    def __init__(self, row: int, const_0: int, const_1: int, i: int):
        self.row = row
        self.const_0 = const_0
        self.const_1 = const_1
        self.i = i

    def dependencies(self):
        from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
        from plonky2_tpu.iop.target import Wire

        return [
            Wire(self.row, ArithmeticGate.wire_ith_multiplicand_0(self.i)),
            Wire(self.row, ArithmeticGate.wire_ith_multiplicand_1(self.i)),
            Wire(self.row, ArithmeticGate.wire_ith_addend(self.i)),
        ]

    def run_once(self, witness, out_buffer):
        from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
        from plonky2_tpu.iop.target import Wire

        m0 = witness.get_target(Wire(self.row, ArithmeticGate.wire_ith_multiplicand_0(self.i)))
        m1 = witness.get_target(Wire(self.row, ArithmeticGate.wire_ith_multiplicand_1(self.i)))
        a = witness.get_target(Wire(self.row, ArithmeticGate.wire_ith_addend(self.i)))
        out = fs.add(fs.mul(self.const_0, fs.mul(m0, m1)), fs.mul(self.const_1, a))
        out_buffer.set_target(Wire(self.row, ArithmeticGate.wire_ith_output(self.i)), out)


def generate_partial_witness(
    inputs: PartialWitness, prover_data, common_data
) -> PartitionWitness:
    """Worklist scheduler (reference iop/generator.rs:26-104)."""
    config = common_data.config
    generators = prover_data.generators
    witness = PartitionWitness(
        prover_data.representative_map, config.num_wires, common_data.degree
    )

    for t, v in inputs.target_values.items():
        witness.set_target(t, v)

    # watch list: representative -> generator indices (built once per circuit)
    generator_indices_by_rep = prover_data.generator_indices_by_watches

    remaining = [True] * len(generators)
    pending: list[int] = list(range(len(generators)))
    buffer = GeneratedValues()

    while pending:
        next_pending: set[int] = set()
        newly_set_reps: list[int] = []
        for gi in pending:
            if not remaining[gi]:
                continue
            gen = generators[gi]
            if not witness.contains_all(gen.dependencies()):
                continue  # stays watched; will be re-queued when deps land
            gen.run_once(witness, buffer)
            remaining[gi] = False
            for t, v in buffer.target_values:
                rep = witness.set_target(t, v)
                if rep is not None:
                    newly_set_reps.append(rep)
            buffer.target_values.clear()
        for rep in newly_set_reps:
            for watcher in generator_indices_by_rep.get(rep, ()):
                if remaining[watcher]:
                    next_pending.add(watcher)
        pending = sorted(next_pending)

    if any(remaining):
        stuck = [generators[i].id() for i, r in enumerate(remaining) if r]
        raise RuntimeError(
            f"{len(stuck)} generators never fired (first few: {stuck[:5]}); "
            "witness may be underconstrained"
        )
    return witness
