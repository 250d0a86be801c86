"""Compiled witness plans: the native executor for witness generation.

The levelized batch engine (iop/generator.py) still pays per-level Python
dispatch and numpy gather/scatter temporaries — in recursion circuits the
~150 small levels (sequential Merkle-path Poseidon chains) made witness
generation the warm-prove bottleneck (~0.2-0.3 s). A `WitnessPlan` compiles
the whole level schedule ONCE per circuit into flat op streams over
partition-representative indices; executing a prove's witness generation is
then a handful of C calls into `native.witness_plan_run` (reference engine:
iop/generator.rs:26-104; each opcode is the exact dual of one generator's
`run_once`).

Generator types without an opcode fall back to their Python `run_batch` /
`run_once` between C segments, so any circuit still generates correctly;
fully-compiled circuits (the recursion family) run 100% native. Random
values are drawn from the seedable prover rng (util/rng.py) in the SAME
order as the levelized engine, so proofs are byte-identical across engines
(asserted by tests/test_witness_plan.py).
"""

from __future__ import annotations

import os

import numpy as np

from plonky2_tpu import native
from plonky2_tpu.field import scalar as fs

# opcodes — keep in sync with enum WpOp in native/src/plonky2_native.cc
_COPY = 1
_ARITH_BASE = 2
_ARITH_EXT = 3
_MUL_EXT = 4
_POSEIDON = 5
_RANDOM_ACCESS = 6
_REDUCING = 7
_REDUCING_EXT = 8
_INTERPOLATION = 9
_QUOTIENT_EXT = 10
_BASE_SPLIT = 11
_WIRE_SPLIT = 12
_LOW_HIGH = 13
_INVERSE = 14
_EQUALITY = 15
_NONZERO = 16
_EXP = 17
_CONSTANT = 18
_RANDOM = 19
_LOOKUP = 20
_CONSTANT_PAIR = 21


def _no_aux(gen):
    return ()


def _interp_aux(gen):
    from plonky2_tpu.gates.coset_interpolation import _cached_gate

    gate = _cached_gate(gen.subgroup_bits, gen.degree)
    domain = fs.two_adic_subgroup(gen.subgroup_bits)
    return (gate._degree, gate.num_points(), *domain, *gate.barycentric_weights)


def _lut_pair_aux(gen):
    """LookupTableGenerator outputs are build-time constants: the (inp, out)
    pair at the generator's slot (or the LUT's first entry as padding) —
    exactly run_once's computation (gates/lookup.py LookupTableGenerator)."""
    first_row = (gen.last_lut_row
                 + (len(gen.lut) + gen.num_slots - 1) // gen.num_slots - 1)
    slot = (first_row - gen.row) * gen.num_slots + gen.slot_nb
    i, o = gen.lut[slot] if slot < len(gen.lut) else gen.lut[0]
    return (i, o)


def _compilers():
    """type -> (opcode, aux_fn). Input/output rep orders are the generator's
    dependencies()/outputs() orders, which the C opcodes mirror exactly.
    aux_fn == "lookup" marks the shared-table opcode (aux patched to the
    table's offset after build)."""
    from plonky2_tpu.gadgets.extension_arithmetic import QuotientGeneratorExtension
    from plonky2_tpu.gadgets.inverse import EqualityGenerator, InverseGenerator
    from plonky2_tpu.gadgets.split_join import LowHighGenerator, WireSplitGenerator
    from plonky2_tpu.gates.arithmetic_extension import (
        ArithmeticExtensionGenerator,
        MulExtensionGenerator,
    )
    from plonky2_tpu.gates.base_sum import BaseSplitGenerator
    from plonky2_tpu.gates.coset_interpolation import InterpolationGenerator
    from plonky2_tpu.gates.exponentiation import ExponentiationGenerator
    from plonky2_tpu.gates.lookup import LookupGenerator, LookupTableGenerator
    from plonky2_tpu.gates.poseidon_gate import PoseidonGenerator
    from plonky2_tpu.gates.random_access import RandomAccessGenerator
    from plonky2_tpu.gates.reducing import ReducingExtensionGenerator, ReducingGenerator
    from plonky2_tpu.iop.generator import (
        ArithmeticBaseGenerator,
        ConstantGenerator,
        CopyGenerator,
        NonzeroTestGenerator,
        RandomValueGenerator,
    )

    return {
        CopyGenerator: (_COPY, _no_aux),
        ArithmeticBaseGenerator: (_ARITH_BASE, lambda g: (g.const_0, g.const_1)),
        ArithmeticExtensionGenerator: (_ARITH_EXT, lambda g: (g.const_0, g.const_1)),
        MulExtensionGenerator: (_MUL_EXT, lambda g: (g.const_0,)),
        PoseidonGenerator: (_POSEIDON, _no_aux),
        RandomAccessGenerator: (_RANDOM_ACCESS, _no_aux),
        ReducingGenerator: (_REDUCING, _no_aux),
        ReducingExtensionGenerator: (_REDUCING_EXT, _no_aux),
        InterpolationGenerator: (_INTERPOLATION, _interp_aux),
        QuotientGeneratorExtension: (_QUOTIENT_EXT, _no_aux),
        BaseSplitGenerator: (_BASE_SPLIT, lambda g: (g.base,)),
        WireSplitGenerator: (_WIRE_SPLIT, lambda g: (g.num_limbs,)),
        LowHighGenerator: (_LOW_HIGH, lambda g: (g.n_log,)),
        InverseGenerator: (_INVERSE, _no_aux),
        EqualityGenerator: (_EQUALITY, _no_aux),
        NonzeroTestGenerator: (_NONZERO, _no_aux),
        ExponentiationGenerator: (_EXP, _no_aux),
        ConstantGenerator: (_CONSTANT, lambda g: (g.constant,)),
        RandomValueGenerator: (_RANDOM, lambda g: (0,)),
        LookupGenerator: (_LOOKUP, "lookup"),
        LookupTableGenerator: (_CONSTANT_PAIR, _lut_pair_aux),
    }


_COMPILERS = None


def enabled() -> bool:
    return native.available and os.environ.get(
        "PLONKY2_TPU_WITNESS_PLAN", "1") != "0"


def _nthreads() -> int:
    env = os.environ.get("PLONKY2_TPU_WITNESS_THREADS")
    if env is not None:
        return max(1, int(env))
    return max(1, min(4, os.cpu_count() or 1))


class WitnessPlan:
    """Flat compiled form of one circuit's generator schedule.

    segments: list of ("c", op_start, op_end) ranges executed natively and
    ("py", gen_cls, [generator indices]) groups run through the Python batch
    engine. Random-value aux slots are refreshed per run, preserving the rng
    draw order of the levelized engine."""

    def __init__(self, generators, levels, witness):
        global _COMPILERS
        if _COMPILERS is None:
            _COMPILERS = _compilers()

        opcodes: list[int] = []
        in_reps: list[int] = []
        out_reps: list[int] = []
        aux: list[int] = []
        in_off = [0]
        out_off = [0]
        aux_off = [0]
        segments: list[tuple] = []
        random_aux_idx: list[int] = []
        barriers: list[int] = [0]  # level-boundary op indices (mt execution)
        seg_start = 0
        rep = witness.rep_index

        # shared LUT storage: each distinct table is appended ONCE to the
        # aux tail; WP_LOOKUP ops carry (offset, len) — patched after build
        lut_ids: dict[int, int] = {}
        lut_tables: list = []
        patch_sites: list[tuple[int, int]] = []  # (aux index, table id)

        for level in levels:
            by_type: dict[type, list[int]] = {}
            for i in level:
                by_type.setdefault(type(generators[i]), []).append(i)
            for gcls, idxs in by_type.items():
                entry = _COMPILERS.get(gcls)
                if entry is None:
                    if seg_start < len(opcodes):
                        segments.append(("c", seg_start, len(opcodes)))
                    segments.append(("py", gcls, idxs))
                    seg_start = len(opcodes)
                    continue
                opcode, aux_fn = entry
                for i in idxs:
                    g = generators[i]
                    if opcode == _RANDOM:
                        random_aux_idx.append(len(aux))
                    opcodes.append(opcode)
                    in_reps.extend(rep(t) for t in g.dependencies())
                    out_reps.extend(rep(t) for t in g.outputs())
                    if aux_fn == "lookup":
                        key = id(g.lut)
                        tid = lut_ids.get(key)
                        if tid is None:
                            tid = len(lut_tables)
                            lut_ids[key] = tid
                            lut_tables.append(g.lut)
                        patch_sites.append((len(aux), tid))
                        aux.extend((0, len(g.lut)))
                    else:
                        aux.extend(int(a) % fs.P for a in aux_fn(g))
                    in_off.append(len(in_reps))
                    out_off.append(len(out_reps))
                    aux_off.append(len(aux))
            if barriers[-1] != len(opcodes):
                barriers.append(len(opcodes))
        if seg_start < len(opcodes):
            segments.append(("c", seg_start, len(opcodes)))

        if lut_tables:
            table_offsets = []
            for t in lut_tables:
                table_offsets.append(len(aux))
                for ti, to in t:
                    aux.extend((int(ti) % fs.P, int(to) % fs.P))
            for site, tid in patch_sites:
                aux[site] = table_offsets[tid]

        self.opcodes = np.asarray(opcodes, np.int32)
        self.in_off = np.asarray(in_off, np.int64)
        self.out_off = np.asarray(out_off, np.int64)
        self.aux_off = np.asarray(aux_off, np.int64)
        self.in_reps = np.asarray(in_reps, np.int64)
        self.out_reps = np.asarray(out_reps, np.int64)
        self.aux = np.asarray(aux, np.uint64)
        self.segments = segments
        self.random_aux_idx = np.asarray(random_aux_idx, np.int64)
        self.fully_native = all(s[0] == "c" for s in segments)
        # known-mask update + barrier slice per C segment (precomputed)
        barriers_np = np.asarray(barriers, np.int64)
        self._seg_out_reps = {}
        self._seg_barriers = {}
        self._seg_threads_ok = {}
        for s in segments:
            if s[0] != "c":
                continue
            start, end = s[1], s[2]
            self._seg_out_reps[(start, end)] = np.unique(
                self.out_reps[self.out_off[start]:self.out_off[end]])
            inner = barriers_np[(barriers_np > start) & (barriers_np < end)]
            self._seg_barriers[(start, end)] = np.concatenate(
                [[start], inner, [end]]).astype(np.int64)
            # MT safety: the C executor assumes each rep has ONE producer per
            # level; two generators writing the same rep in one level would
            # be a C++ data race (benign same-value in practice, still UB) —
            # and a consumer could co-schedule with the second producer.
            # Such levels run single-threaded.
            bars = self._seg_barriers[(start, end)]
            ok = True
            for b0, b1 in zip(bars[:-1], bars[1:]):
                lvl = self.out_reps[self.out_off[b0]:self.out_off[b1]]
                if len(np.unique(lvl)) != len(lvl):
                    ok = False
                    break
            self._seg_threads_ok[(start, end)] = ok

        # external inputs per C segment: reps READ by the segment's ops but
        # produced by no compiled op before the segment's end (levelization
        # orders in-segment producers before consumers) — they must be known
        # (PartialWitness inputs or a preceding py segment) when the segment
        # runs; the C executor would silently read 0 for an unset slot where
        # the levelized engine raised. Checked per run() against
        # witness.known.
        self._seg_ext_in = {}
        for s in segments:
            if s[0] != "c":
                continue
            start, end = s[1], s[2]
            seg_in = np.unique(self.in_reps[self.in_off[start]:self.in_off[end]])
            produced = self.out_reps[:self.out_off[end]]
            self._seg_ext_in[(start, end)] = np.setdiff1d(
                seg_in, produced, assume_unique=False)

    def run(self, witness, generators) -> None:
        from plonky2_tpu.iop.generator import GeneratedValues, _BATCH_MIN
        from plonky2_tpu.util import rng

        if len(self.random_aux_idx):
            self.aux[self.random_aux_idx] = rng.field_elements(
                len(self.random_aux_idx), fs.P)
        values = witness.values
        assert values.flags["C_CONTIGUOUS"]
        buffer = None
        for seg in self.segments:
            if seg[0] == "c":
                _, start, end = seg
                ext = self._seg_ext_in[(start, end)]
                if ext.size and not witness.known[ext].all():
                    missing = ext[~witness.known[ext]]
                    raise ValueError(
                        f"batch read of unset representative: {missing[:8]} "
                        "— a required PartialWitness input is missing "
                        "(witness plan would silently read 0)")
                nthreads = (_nthreads()
                            if self._seg_threads_ok[(start, end)] else 1)
                rc = native.witness_plan_run_mt(
                    values, self.opcodes, self.in_off, self.out_off,
                    self.aux_off, self.in_reps, self.out_reps, self.aux,
                    self._seg_barriers[(start, end)], nthreads)
                if rc >= 0:
                    raise RuntimeError(
                        f"witness plan op {rc} (opcode {self.opcodes[rc]}) "
                        "failed: bad access index, overflowing decomposition, "
                        "or zero division — witness is inconsistent")
                witness.known[self._seg_out_reps[(start, end)]] = True
            else:
                _, gcls, idxs = seg
                run_batch = getattr(gcls, "run_batch", None)
                if run_batch is not None and len(idxs) >= getattr(
                        gcls, "BATCH_MIN", _BATCH_MIN):
                    run_batch([generators[i] for i in idxs], witness)
                    continue
                if buffer is None:
                    buffer = GeneratedValues()
                for i in idxs:
                    generators[i].run_once(witness, buffer)
                    for t, v in buffer.target_values:
                        witness.set_target(t, v)
                    buffer.target_values.clear()
