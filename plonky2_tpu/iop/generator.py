"""Witness generators + worklist scheduler (reference iop/generator.rs).

Witness generation is an inherently sequential, data-dependent dependency
graph — the wrong shape for the TPU — so it runs host-side. Generators fire
once all their dependency targets have values; newly-set targets wake the
generators watching them (watch lists keyed by partition representative).
"""

from __future__ import annotations

import numpy as np

from plonky2_tpu.field import np_field as npf
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

    def outputs(self) -> list[Target] | None:
        """Targets this generator writes, for build-time levelization.
        None = statically unknown; circuits containing such a generator fall
        back to the dynamic worklist scheduler."""
        return None

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

    def outputs(self):
        from plonky2_tpu.iop.target import Wire

        return [Wire(self.row, self.wire_index)]

    def run_once(self, witness, out_buffer):
        from plonky2_tpu.iop.target import Wire

        out_buffer.set_target(Wire(self.row, self.wire_index), self.constant)

    @classmethod
    def run_batch(cls, gens, witness):
        reps = _reps(witness, (g.outputs()[0] for g in gens), len(gens))
        vals = np.fromiter((g.constant for g in gens), np.uint64, len(gens))
        witness.set_reps(reps, vals)


class CopyGenerator(SimpleGenerator):
    def __init__(self, src: Target, dst: Target):
        self.src = src
        self.dst = dst

    def dependencies(self):
        return [self.src]

    def outputs(self):
        return [self.dst]

    def run_once(self, witness, out_buffer):
        out_buffer.set_target(self.dst, witness.get_target(self.src))

    @classmethod
    def run_batch(cls, gens, witness):
        src = _reps(witness, (g.src for g in gens), len(gens))
        dst = _reps(witness, (g.dst for g in gens), len(gens))
        witness.set_reps(dst, witness.get_reps(src))


class RandomValueGenerator(SimpleGenerator):
    def __init__(self, target: Target):
        self.target = target

    def dependencies(self):
        return []

    def outputs(self):
        return [self.target]

    def run_once(self, witness, out_buffer):
        from plonky2_tpu.util import rng

        out_buffer.set_target(self.target, int(rng.field_elements(1, fs.P)[0]))

    @classmethod
    def run_batch(cls, gens, witness):
        from plonky2_tpu.util import rng

        reps = _reps(witness, (g.target for g in gens), len(gens))
        witness.set_reps(reps, rng.field_elements(len(gens), fs.P))


class NonzeroTestGenerator(SimpleGenerator):
    def __init__(self, to_test: Target, dummy: Target):
        self.to_test = to_test
        self.dummy = dummy

    def dependencies(self):
        return [self.to_test]

    def outputs(self):
        return [self.dummy]

    def run_once(self, witness, out_buffer):
        v = witness.get_target(self.to_test)
        out_buffer.set_target(self.dummy, fs.inverse(v) if v != 0 else 1)

    @classmethod
    def run_batch(cls, gens, witness):
        from plonky2_tpu import native

        if not native.available:
            buf = GeneratedValues()
            for g in gens:
                g.run_once(witness, buf)
            for t, v in buf.target_values:
                witness.set_target(t, v)
            return
        n = len(gens)
        x = witness.get_reps(_reps(witness, (g.to_test for g in gens), n))
        inv = native.batch_inverse(x)
        witness.set_reps(
            _reps(witness, (g.dummy for g in gens), n),
            np.where(x == np.uint64(0), np.uint64(1), inv),
        )


def _reps(witness, targets, n) -> np.ndarray:
    return np.fromiter((witness.rep_index(t) for t in targets), np.int64, n)


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

    def outputs(self):
        from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
        from plonky2_tpu.iop.target import Wire

        return [Wire(self.row, ArithmeticGate.wire_ith_output(self.i))]

    def run_once(self, witness, out_buffer):
        from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
        from plonky2_tpu.iop.target import Wire

        m0 = witness.get_target(Wire(self.row, ArithmeticGate.wire_ith_multiplicand_0(self.i)))
        m1 = witness.get_target(Wire(self.row, ArithmeticGate.wire_ith_multiplicand_1(self.i)))
        a = witness.get_target(Wire(self.row, ArithmeticGate.wire_ith_addend(self.i)))
        out = fs.add(fs.mul(self.const_0, fs.mul(m0, m1)), fs.mul(self.const_1, a))
        out_buffer.set_target(Wire(self.row, ArithmeticGate.wire_ith_output(self.i)), out)

    @classmethod
    def run_batch(cls, gens, witness):
        n = len(gens)
        rows = np.fromiter((g.row for g in gens), np.int64, n)
        base = np.fromiter((4 * g.i for g in gens), np.int64, n)
        m0 = witness.get_reps(witness.wire_reps(rows, base))
        m1 = witness.get_reps(witness.wire_reps(rows, base + 1))
        a = witness.get_reps(witness.wire_reps(rows, base + 2))
        c0 = np.fromiter((g.const_0 for g in gens), np.uint64, n)
        c1 = np.fromiter((g.const_1 for g in gens), np.uint64, n)
        from plonky2_tpu import native

        if native.available:
            out = native.arith(c0, c1, m0, m1, a)
        else:
            out = npf.add(npf.mul(c0, npf.mul(m0, m1)), npf.mul(c1, a))
        witness.set_reps(witness.wire_reps(rows, base + 3), out)


def _levelize(generators, witness) -> list[list[int]] | None:
    """Static topological levels over partition representatives.

    A generator's dependency is 'internal' iff some generator produces its
    representative; external deps come from the PartialWitness inputs (set
    before level 0). Returns None — fall back to the dynamic worklist — if
    any generator lacks static outputs() or the conservative graph stalls.
    The level schedule depends only on the circuit, so callers cache it on
    the prover data."""
    n = len(generators)
    out_reps: list[list[int]] = []
    deps_reps: list[list[int]] = []
    for g in generators:
        outs = g.outputs()
        if outs is None:
            return None
        out_reps.append([witness.rep_index(t) for t in outs])
        deps_reps.append([witness.rep_index(t) for t in g.dependencies()])
    produced: set[int] = set()
    for reps in out_reps:
        produced.update(reps)
    waiters: dict[int, list[int]] = {}
    unseen = [0] * n
    for i, reps in enumerate(deps_reps):
        for r in set(reps):
            if r in produced:
                unseen[i] += 1
                waiters.setdefault(r, []).append(i)
    current = [i for i in range(n) if unseen[i] == 0]
    levels = []
    fired = 0
    seen: set[int] = set()
    while current:
        levels.append(current)
        fired += len(current)
        newly: list[int] = []
        for i in current:
            for r in out_reps[i]:
                if r not in seen:
                    seen.add(r)
                    newly.append(r)
        nxt: list[int] = []
        for r in newly:
            for w in waiters.get(r, ()):
                unseen[w] -= 1
                if unseen[w] == 0:
                    nxt.append(w)
        current = nxt
    return levels if fired == n else None


_BATCH_MIN = 8  # below this, scalar run_once beats numpy setup cost


def _run_levelized(witness, generators, levels) -> None:
    buffer = GeneratedValues()
    for level in levels:
        by_type: dict[type, list[int]] = {}
        for i in level:
            by_type.setdefault(type(generators[i]), []).append(i)
        for gcls, idxs in by_type.items():
            run_batch = getattr(gcls, "run_batch", None)
            # classes whose batch path has no numpy setup penalty (e.g. the
            # native Poseidon witness kernel) lower their own threshold
            if run_batch is not None and len(idxs) >= getattr(
                    gcls, "BATCH_MIN", _BATCH_MIN):
                run_batch([generators[i] for i in idxs], witness)
                continue
            for i in idxs:
                generators[i].run_once(witness, buffer)
                for t, v in buffer.target_values:
                    witness.set_target(t, v)
                buffer.target_values.clear()


def _scatter_inputs(inputs: PartialWitness, witness: PartitionWitness,
                    num_wires: int, degree: int) -> None:
    """Vectorized write of the PartialWitness inputs (one set_reps call
    instead of a Python set_target per target). The flat-index/value arrays
    are cached on the PartialWitness — its dict is append-only and values
    are write-once, so re-proving with the same inputs object (the warm
    bench loop) skips the Python iteration entirely."""
    from plonky2_tpu.iop.target import target_index

    items = inputs.target_values
    n = len(items)
    if n == 0:
        return
    cache = getattr(inputs, "_index_cache", None)
    if cache is not None and cache[0] == (n, num_wires, degree):
        idx, vals = cache[1], cache[2]
    else:
        idx = np.fromiter(
            (target_index(t, num_wires, degree) for t in items), np.int64, n)
        vals = np.fromiter(items.values(), np.uint64, n)
        inputs._index_cache = ((n, num_wires, degree), idx, vals)
    witness.set_reps(witness.rep_map_np()[idx], vals)


def generate_partial_witness(
    inputs: PartialWitness, prover_data, common_data
) -> PartitionWitness:
    """Levelized batch scheduler with dynamic-worklist fallback
    (reference iop/generator.rs:26-104 is the worklist)."""
    config = common_data.config
    generators = prover_data.generators
    # cache the numpy representative map on the circuit (the list->array
    # conversion and its max() cost ~16ms per prove on a 2^12 circuit)
    rep_np = getattr(prover_data, "_rep_map_np", None)
    if rep_np is None:
        rep_np = np.asarray(prover_data.representative_map, dtype=np.int64)
        prover_data._rep_map_np = rep_np
    witness = PartitionWitness(rep_np, config.num_wires, common_data.degree)

    _scatter_inputs(inputs, witness, config.num_wires, common_data.degree)

    levels = getattr(prover_data, "_generator_levels", False)
    if levels is False:  # not yet computed for this circuit
        levels = _levelize(generators, witness)
        prover_data._generator_levels = levels
    if levels is not None:
        from plonky2_tpu.iop import witness_plan as wp

        if wp.enabled():
            plan = getattr(prover_data, "_witness_plan", None)
            if plan is None:
                plan = wp.WitnessPlan(generators, levels, witness)
                prover_data._witness_plan = plan
            plan.run(witness, generators)
            return witness
        _run_levelized(witness, generators, levels)
        return witness

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
