"""Prover-side circuit data serialization: generators by tag + full
CircuitData / ProverCircuitData round-trip.

Reference: util/serialization/generator_serialization.rs:144-183 (the
DefaultGeneratorSerializer 24-tag registry), mod.rs:1834-1933
(write_prover_only_circuit_data field order), plonk/circuit_data.rs:170-187
(CircuitData::to_bytes/from_bytes). The byte layout follows the reference
field-for-field (u32 generator tags in the same registry order, targets as
bool-is-wire + usizes, mod.rs:205-216) with one TPU-native deviation: the
constants/sigmas PolynomialBatch stores only the coefficient polynomials +
(degree_log, rate_bits, blinding) and the LDE + Merkle tree are recomputed
on load (deterministic, bit-identical) instead of shipping the 8x-blown-up
LDE leaves and digest buffers (reference mod.rs:1417-1432 serializes the
whole tree).
"""

from __future__ import annotations

import numpy as np

from plonky2_tpu.iop.target import BoolTarget, ExtensionTarget, Target, VirtualTarget, Wire
from plonky2_tpu.plonk.circuit_serialization import CircuitReader, CircuitWriter


# -- target primitives (reference mod.rs:205-266, 1329-1360) ------------------


class ProverWriter(CircuitWriter):
    def write_target(self, t: Target) -> None:
        if isinstance(t, Wire):
            self.write_bool(True)
            self.write_usize(t.row)
            self.write_usize(t.column)
        else:
            self.write_bool(False)
            self.write_usize(t.index)

    def write_target_vec(self, v) -> None:
        self.write_usize(len(v))
        for t in v:
            self.write_target(t)

    def write_target_ext(self, et: ExtensionTarget) -> None:
        for t in et.parts:
            self.write_target(t)


class ProverReader(CircuitReader):
    def read_target(self) -> Target:
        if self.read_bool():
            return Wire(self.read_usize(), self.read_usize())
        return VirtualTarget(self.read_usize())

    def read_target_vec(self) -> list:
        return [self.read_target() for _ in range(self.read_usize())]

    def read_target_ext(self) -> ExtensionTarget:
        return ExtensionTarget((self.read_target(), self.read_target()))


# -- generic target-structure flatten/rebuild ---------------------------------
#
# DummyProofGenerator carries a whole nested proof-target structure; rather
# than a bespoke writer per dataclass, targets are flattened in allocation
# (DFS) order and the structure is rebuilt by replaying the same allocation
# functions against a replay builder that pops the flat list.


def flatten_targets(obj, out: list) -> None:
    import dataclasses

    if isinstance(obj, (Wire, VirtualTarget)):
        out.append(obj)
    elif isinstance(obj, BoolTarget):
        out.append(obj.target)
    elif isinstance(obj, ExtensionTarget):
        out.extend(obj.parts)
    elif isinstance(obj, (list, tuple)):
        for x in obj:
            flatten_targets(x, out)
    elif dataclasses.is_dataclass(obj):
        for f in dataclasses.fields(obj):
            flatten_targets(getattr(obj, f.name), out)
    else:
        raise TypeError(f"cannot flatten targets from {type(obj)}")


class TargetReplayBuilder:
    """Quacks like CircuitBuilder for virtual-target allocation, popping
    targets from a previously flattened list."""

    def __init__(self, targets):
        self._it = iter(targets)

    def add_virtual_target(self):
        return next(self._it)

    def add_virtual_targets(self, n):
        return [next(self._it) for _ in range(n)]

    def add_virtual_hash(self):
        return self.add_virtual_targets(4)

    def add_virtual_extension_target(self):
        return ExtensionTarget(tuple(self.add_virtual_targets(2)))

    def add_virtual_extension_targets(self, n):
        return [self.add_virtual_extension_target() for _ in range(n)]


# -- per-generator payloads ----------------------------------------------------
#
# Payload formats mirror the reference generator `serialize` impls
# (file:line cited per entry below).


def _write_generator_payload(w: ProverWriter, gen, common) -> None:
    from plonky2_tpu.gadgets.extension_arithmetic import QuotientGeneratorExtension
    from plonky2_tpu.gadgets.inverse import EqualityGenerator, InverseGenerator
    from plonky2_tpu.gadgets.split_join import LowHighGenerator, WireSplitGenerator
    from plonky2_tpu.gates.arithmetic_extension import (
        ArithmeticExtensionGenerator,
        MulExtensionGenerator,
    )
    from plonky2_tpu.gates.base_sum import BaseSplitGenerator
    from plonky2_tpu.gates.coset_interpolation import (
        CosetInterpolationGate,
        InterpolationGenerator,
    )
    from plonky2_tpu.gates.exponentiation import ExponentiationGenerator
    from plonky2_tpu.gates.lookup import LookupGenerator, LookupTableGenerator
    from plonky2_tpu.gates.poseidon_gate import PoseidonGenerator
    from plonky2_tpu.gates.poseidon_mds import PoseidonMdsGenerator
    from plonky2_tpu.gates.random_access import RandomAccessGenerator
    from plonky2_tpu.gates.reducing import ReducingExtensionGenerator, ReducingGenerator
    from plonky2_tpu.iop.generator import (
        ArithmeticBaseGenerator,
        ConstantGenerator,
        CopyGenerator,
        NonzeroTestGenerator,
        RandomValueGenerator,
    )
    from plonky2_tpu.recursion.dummy_circuit import DummyProofGenerator

    t = type(gen)
    if t is ArithmeticBaseGenerator or t is ArithmeticExtensionGenerator:
        # arithmetic_base.rs:233-238 / arithmetic_extension.rs:226-231
        w.write_usize(gen.row)
        w.write_field(gen.const_0)
        w.write_field(gen.const_1)
        w.write_usize(gen.i)
    elif t is BaseSplitGenerator:
        # split_base gate generator: base_sum.rs:221-224 (base from tag <2>)
        w.write_usize(gen.row)
        w.write_usize(gen.num_limbs)
    elif t is ConstantGenerator:
        # iop/generator.rs:424-428
        w.write_usize(gen.row)
        w.write_usize(gen.constant_index)
        w.write_usize(gen.wire_index)
        w.write_field(gen.constant)
    elif t is CopyGenerator:
        # iop/generator.rs:302-304
        w.write_target(gen.src)
        w.write_target(gen.dst)
    elif t is DummyProofGenerator:
        # dummy_circuit.rs:289-293; target structures flattened + replayed
        _write_dummy_proof_generator(w, gen)
    elif t is EqualityGenerator:
        # gadgets/arithmetic.rs:416-420
        w.write_target(gen.x)
        w.write_target(gen.y)
        w.write_target(gen.equal)
        w.write_target(gen.inv_hint)
    elif t is ExponentiationGenerator:
        # exponentiation.rs:308-310 (row + gate payload)
        w.write_usize(gen.row)
        w.write_usize(gen.num_power_bits)
    elif t is InterpolationGenerator:
        # coset_interpolation.rs:513-515 (row + gate payload incl. weights)
        w.write_usize(gen.row)
        w.write_usize(gen.subgroup_bits)
        w.write_usize(gen.degree)
        weights = CosetInterpolationGate(gen.subgroup_bits, gen.degree).barycentric_weights
        w.write_usize(len(weights))
        w.write_field_vec(weights)
    elif t is LookupGenerator:
        # lookup.rs:224-230
        w.write_usize(gen.row)
        w.write_usize(gen.slot_nb)
        w.write_usize(common.luts.index(gen.lut))
    elif t is LookupTableGenerator:
        # lookup_table.rs:235-241
        w.write_usize(gen.row)
        w.write_usize(gen.slot_nb)
        w.write_usize(gen.num_slots)
        w.write_usize(gen.last_lut_row)
        w.write_usize(common.luts.index(gen.lut))
    elif t is LowHighGenerator:
        # gadgets/range_check.rs:92-96
        w.write_target(gen.integer)
        w.write_usize(gen.n_log)
        w.write_target(gen.low)
        w.write_target(gen.high)
    elif t is MulExtensionGenerator:
        # multiplication_extension.rs:203-206
        w.write_usize(gen.row)
        w.write_field(gen.const_0)
        w.write_usize(gen.i)
    elif t is NonzeroTestGenerator:
        # iop/generator.rs:380-382
        w.write_target(gen.to_test)
        w.write_target(gen.dummy)
    elif t is PoseidonGenerator or t is PoseidonMdsGenerator:
        # poseidon.rs:532-533 / poseidon_mds.rs:270-271
        w.write_usize(gen.row)
    elif t is QuotientGeneratorExtension:
        # gadgets/arithmetic_extension.rs:550-553
        w.write_target_ext(gen.numerator)
        w.write_target_ext(gen.denominator)
        w.write_target_ext(gen.quotient)
    elif t is RandomAccessGenerator:
        # random_access.rs:408-411 (row + copy + gate payload)
        w.write_usize(gen.row)
        w.write_usize(gen.copy)
        w.write_usize(gen.bits)
        w.write_usize(gen.num_copies)
        w.write_usize(gen.num_extra_constants)
    elif t is RandomValueGenerator:
        # iop/generator.rs:338-339
        w.write_target(gen.target)
    elif t is ReducingGenerator or t is ReducingExtensionGenerator:
        # reducing.rs:240-242 / reducing_extension.rs:235-237
        w.write_usize(gen.row)
        w.write_usize(gen.num_coeffs)
    elif t is WireSplitGenerator:
        # gadgets/split_join.rs:162-165
        w.write_target(gen.integer)
        w.write_usize_vec(gen.gates)
        w.write_usize(gen.num_limbs)
    elif t is InverseGenerator:
        # framework-specific (no reference dual; the reference computes
        # inverses through QuotientGeneratorExtension)
        w.write_target(gen.x)
        w.write_target(gen.inv)
    else:
        raise ValueError(f"unsupported generator {t.__name__}")


def _read_generator_payload(r: ProverReader, cls, common):
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
    from plonky2_tpu.gates.poseidon_mds import PoseidonMdsGenerator
    from plonky2_tpu.gates.random_access import RandomAccessGenerator
    from plonky2_tpu.gates.reducing import ReducingExtensionGenerator, ReducingGenerator
    from plonky2_tpu.iop.generator import (
        ArithmeticBaseGenerator,
        ConstantGenerator,
        CopyGenerator,
        NonzeroTestGenerator,
        RandomValueGenerator,
    )
    from plonky2_tpu.recursion.dummy_circuit import DummyProofGenerator

    if cls in (ArithmeticBaseGenerator, ArithmeticExtensionGenerator):
        return cls(r.read_usize(), r.read_field(), r.read_field(), r.read_usize())
    if cls is BaseSplitGenerator:
        return cls(r.read_usize(), r.read_usize(), 2)
    if cls is ConstantGenerator:
        return cls(r.read_usize(), r.read_usize(), r.read_usize(), r.read_field())
    if cls is CopyGenerator:
        return cls(r.read_target(), r.read_target())
    if cls is DummyProofGenerator:
        return _read_dummy_proof_generator(r)
    if cls is EqualityGenerator:
        return cls(r.read_target(), r.read_target(), r.read_target(), r.read_target())
    if cls is ExponentiationGenerator:
        return cls(r.read_usize(), r.read_usize())
    if cls is InterpolationGenerator:
        row = r.read_usize()
        subgroup_bits = r.read_usize()
        degree = r.read_usize()
        r.read_field_vec(r.read_usize())  # weights: recomputed by the gate
        return cls(row, subgroup_bits, degree)
    if cls is LookupGenerator:
        return _read_lookup(r, cls, common)
    if cls is LookupTableGenerator:
        return _read_lookup_table(r, cls, common)
    if cls is LowHighGenerator:
        return cls(r.read_target(), r.read_usize(), r.read_target(), r.read_target())
    if cls is MulExtensionGenerator:
        return cls(r.read_usize(), r.read_field(), r.read_usize())
    if cls is NonzeroTestGenerator:
        return cls(r.read_target(), r.read_target())
    if cls in (PoseidonGenerator, PoseidonMdsGenerator):
        return cls(r.read_usize())
    if cls is QuotientGeneratorExtension:
        return cls(r.read_target_ext(), r.read_target_ext(), r.read_target_ext())
    if cls is RandomAccessGenerator:
        return cls(r.read_usize(), *_random_access_args(r))
    if cls is RandomValueGenerator:
        return cls(r.read_target())
    if cls in (ReducingGenerator, ReducingExtensionGenerator):
        return cls(r.read_usize(), r.read_usize())
    if cls is WireSplitGenerator:
        return cls(r.read_target(), r.read_usize_vec(), r.read_usize())
    if cls is InverseGenerator:
        return cls(r.read_target(), r.read_target())
    raise ValueError(f"unsupported generator class {cls}")


def _read_lookup(r, cls, common):
    row = r.read_usize()
    slot_nb = r.read_usize()
    lut = common.luts[r.read_usize()]
    return cls(row, lut, slot_nb)


def _read_lookup_table(r, cls, common):
    row = r.read_usize()
    slot_nb = r.read_usize()
    num_slots = r.read_usize()
    last_lut_row = r.read_usize()
    lut = common.luts[r.read_usize()]
    return cls(row, lut, slot_nb, num_slots, last_lut_row)


def _random_access_args(r):
    copy = r.read_usize()
    bits = r.read_usize()
    num_copies = r.read_usize()
    num_extra = r.read_usize()
    return bits, num_copies, num_extra, copy


def _write_dummy_proof_generator(w: ProverWriter, gen) -> None:
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    inner_common = gen.inner_common
    # verifier data target (flat targets: digest after cap, per our dataclass)
    vk_flat: list = []
    flatten_targets(gen.verifier_data_target, vk_flat)
    w.write_usize(len(gen.verifier_data_target.constants_sigmas_cap))
    w.write_target_vec(vk_flat)
    # verifier circuit data (verifier_only + common) — reference format
    vd_bytes = verifier_data_to_bytes(gen.verifier_only, inner_common)
    w.write_usize(len(vd_bytes))
    w.buf += vd_bytes
    # proof target structure (flat targets, replayed on read from common)
    pt_flat: list = []
    flatten_targets(gen.proof_with_pis_target, pt_flat)
    w.write_target_vec(pt_flat)
    # the concrete proof
    p_bytes = proof_to_bytes(gen.proof_with_pis)
    w.write_usize(len(p_bytes))
    w.buf += p_bytes


def _read_dummy_proof_generator(r: ProverReader):
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_from_bytes
    from plonky2_tpu.plonk.serialization import proof_from_bytes
    from plonky2_tpu.recursion.dummy_circuit import DummyProofGenerator
    from plonky2_tpu.recursion.recursive_verifier import (
        VerifierCircuitTarget,
        add_virtual_proof_with_pis,
    )

    cap_len = r.read_usize()
    vk_flat = r.read_target_vec()
    rb = TargetReplayBuilder(vk_flat)
    vk_t = VerifierCircuitTarget(
        constants_sigmas_cap=[rb.add_virtual_hash() for _ in range(cap_len)],
        circuit_digest=rb.add_virtual_hash(),
    )
    vd_len = r.read_usize()
    vd_bytes = bytes(r.data[r.pos:r.pos + vd_len])
    r.pos += vd_len
    verifier_only, inner_common = verifier_data_from_bytes(vd_bytes)

    pt_flat = r.read_target_vec()
    pt = add_virtual_proof_with_pis(TargetReplayBuilder(pt_flat), inner_common)
    check: list = []
    flatten_targets(pt, check)
    assert check == pt_flat, "proof-target replay order mismatch"

    p_len = r.read_usize()
    p_bytes = bytes(r.data[r.pos:r.pos + p_len])
    r.pos += p_len
    proof = proof_from_bytes(p_bytes, inner_common)

    gen = DummyProofGenerator(pt, proof, vk_t, verifier_only)
    gen.inner_common = inner_common
    return gen


# -- registry (reference generator_serialization.rs:155-182 order) ------------

def _default_registry():
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
    from plonky2_tpu.gates.poseidon_mds import PoseidonMdsGenerator
    from plonky2_tpu.gates.random_access import RandomAccessGenerator
    from plonky2_tpu.gates.reducing import ReducingExtensionGenerator, ReducingGenerator
    from plonky2_tpu.iop.generator import (
        ArithmeticBaseGenerator,
        ConstantGenerator,
        CopyGenerator,
        NonzeroTestGenerator,
        RandomValueGenerator,
    )
    from plonky2_tpu.recursion.dummy_circuit import DummyProofGenerator

    return [
        ArithmeticBaseGenerator,        # 0
        ArithmeticExtensionGenerator,   # 1
        BaseSplitGenerator,             # 2  (BaseSplitGenerator<2>)
        None,                           # 3  BaseSumGenerator<2> (no dual here)
        ConstantGenerator,              # 4
        CopyGenerator,                  # 5
        DummyProofGenerator,            # 6
        EqualityGenerator,              # 7
        ExponentiationGenerator,        # 8
        InterpolationGenerator,         # 9
        LookupGenerator,                # 10
        LookupTableGenerator,           # 11
        LowHighGenerator,               # 12
        MulExtensionGenerator,          # 13
        NonzeroTestGenerator,           # 14
        PoseidonGenerator,              # 15
        PoseidonMdsGenerator,           # 16
        QuotientGeneratorExtension,     # 17
        RandomAccessGenerator,          # 18
        RandomValueGenerator,           # 19
        ReducingGenerator,              # 20
        ReducingExtensionGenerator,     # 21
        None,                           # 22 SplitGenerator (no dual here)
        WireSplitGenerator,             # 23
        InverseGenerator,               # 24 framework-specific extension
    ]


def write_generator(w: ProverWriter, gen, common, registry=None) -> None:
    registry = registry or _default_registry()
    t = type(gen)
    for tag, cls in enumerate(registry):
        if cls is t:
            w.write_u32(tag)
            _write_generator_payload(w, gen, common)
            return
    raise ValueError(
        f"generator {t.__name__} is not in the serializer registry; pass a "
        f"custom registry (reference WitnessGeneratorSerializer pattern)")


def read_generator(r: ProverReader, common, registry=None):
    registry = registry or _default_registry()
    tag = r.read_u32()
    cls = registry[tag]
    if cls is None:
        raise ValueError(f"generator tag {tag} has no implementation")
    return _read_generator_payload(r, cls, common)


# -- polynomial batch (coefficients only; LDE + tree recomputed) ---------------


def write_polynomial_batch(w: ProverWriter, batch) -> None:
    polys = np.asarray(batch.polynomials, dtype=np.uint64)
    w.write_usize(polys.shape[0])
    w.write_usize(polys.shape[1])
    w.buf += polys.tobytes()
    w.write_usize(batch.degree_log)
    w.write_usize(batch.rate_bits)
    w.write_bool(batch.blinding)


def read_polynomial_batch(r: ProverReader, common):
    from plonky2_tpu.fri.oracle import PolynomialBatch

    num_polys = r.read_usize()
    n = r.read_usize()
    nbytes = num_polys * n * 8
    polys = np.frombuffer(r.data[r.pos:r.pos + nbytes], dtype=np.uint64).reshape(
        num_polys, n).copy()
    r.pos += nbytes
    degree_log = r.read_usize()
    rate_bits = r.read_usize()
    blinding = r.read_bool()
    hasher = common.generic_config().hasher
    batch = PolynomialBatch.from_coeffs(polys, rate_bits, blinding,
                                        common.config.fri_config.cap_height,
                                        hasher=hasher)
    assert batch.degree_log == degree_log
    return batch


# -- prover-only circuit data (reference mod.rs:1834-1933 field order) ---------


def write_prover_only_circuit_data(w: ProverWriter, prover_only, common,
                                   registry=None) -> None:
    w.write_usize(len(prover_only.generators))
    for gen in prover_only.generators:
        write_generator(w, gen, common, registry)

    watches = prover_only.generator_indices_by_watches
    w.write_usize(len(watches))
    for k in sorted(watches):
        w.write_usize(k)
        w.write_usize_vec(list(watches[k]))

    write_polynomial_batch(w, prover_only.constants_sigmas_commitment)

    sigmas = np.asarray(prover_only.sigmas, dtype=np.uint64)
    w.write_usize(sigmas.shape[0])
    w.write_usize(sigmas.shape[1])
    w.buf += sigmas.tobytes()

    subgroup = np.asarray(prover_only.subgroup, dtype=np.uint64)
    w.write_usize(len(subgroup))
    w.buf += subgroup.tobytes()

    w.write_target_vec(prover_only.public_inputs)
    w.write_usize_vec(list(prover_only.representative_map))
    w.write_bool(False)  # fft_root_table: None (tables are jit-time consts here)
    w.write_hash(prover_only.circuit_digest)

    w.write_usize(len(prover_only.lookup_rows))
    for lw in prover_only.lookup_rows:
        w.write_usize(lw.last_lu_gate)
        w.write_usize(lw.last_lut_gate)
        w.write_usize(lw.first_lut_gate)

    w.write_usize(len(prover_only.lut_to_lookups))
    for lut_lookups in prover_only.lut_to_lookups:
        w.write_usize(len(lut_lookups))
        for (inp, out) in lut_lookups:
            w.write_target(inp)
            w.write_target(out)


def read_prover_only_circuit_data(r: ProverReader, common, registry=None):
    from plonky2_tpu.gadgets.lookup import LookupWire
    from plonky2_tpu.plonk.circuit_data import ProverOnlyCircuitData

    generators = [read_generator(r, common, registry)
                  for _ in range(r.read_usize())]
    watches = {}
    for _ in range(r.read_usize()):
        k = r.read_usize()
        watches[k] = r.read_usize_vec()

    commitment = read_polynomial_batch(r, common)

    rows = r.read_usize()
    cols = r.read_usize()
    nbytes = rows * cols * 8
    sigmas = np.frombuffer(r.data[r.pos:r.pos + nbytes], dtype=np.uint64).reshape(
        rows, cols).copy()
    r.pos += nbytes

    sg_len = r.read_usize()
    subgroup = np.frombuffer(r.data[r.pos:r.pos + sg_len * 8], dtype=np.uint64).copy()
    r.pos += sg_len * 8

    public_inputs = r.read_target_vec()
    representative_map = r.read_usize_vec()
    assert not r.read_bool()  # fft_root_table
    circuit_digest = r.read_hash()

    lookup_rows = [
        LookupWire(last_lu_gate=r.read_usize(), last_lut_gate=r.read_usize(),
                   first_lut_gate=r.read_usize())
        for _ in range(r.read_usize())
    ]
    lut_to_lookups = [
        [(r.read_target(), r.read_target()) for _ in range(r.read_usize())]
        for _ in range(r.read_usize())
    ]

    return ProverOnlyCircuitData(
        generators=generators,
        generator_indices_by_watches=watches,
        constants_sigmas_commitment=commitment,
        sigmas=sigmas,
        subgroup=list(subgroup),
        public_inputs=public_inputs,
        representative_map=representative_map,
        circuit_digest=circuit_digest,
        lookup_rows=lookup_rows,
        lut_to_lookups=lut_to_lookups,
    )


# -- top-level round trips (reference circuit_data.rs:170-187, 268-287) --------


def circuit_data_to_bytes(data, registry=None) -> bytes:
    w = ProverWriter()
    w.write_common_circuit_data(data.common)
    write_prover_only_circuit_data(w, data.prover_only, data.common, registry)
    w.write_verifier_only_circuit_data(data.verifier_only)
    return bytes(w.buf)


def circuit_data_from_bytes(data: bytes, registry=None):
    from plonky2_tpu.plonk.circuit_data import CircuitData

    r = ProverReader(data)
    common = r.read_common_circuit_data()
    prover_only = read_prover_only_circuit_data(r, common, registry)
    verifier_only = r.read_verifier_only_circuit_data()
    assert r.pos == len(data)
    return CircuitData(prover_only=prover_only, verifier_only=verifier_only,
                       common=common)


def prover_data_to_bytes(prover_only, common, registry=None) -> bytes:
    """ProverCircuitData dual (reference circuit_data.rs:268-287)."""
    w = ProverWriter()
    w.write_common_circuit_data(common)
    write_prover_only_circuit_data(w, prover_only, common, registry)
    return bytes(w.buf)


def prover_data_from_bytes(data: bytes, registry=None):
    r = ProverReader(data)
    common = r.read_common_circuit_data()
    prover_only = read_prover_only_circuit_data(r, common, registry)
    assert r.pos == len(data)
    return prover_only, common
