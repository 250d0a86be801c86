"""Circuit data serialization in the reference byte format
(reference util/serialization/mod.rs:1623-1960 and the DefaultGateSerializer
registry, gate_serialization.rs:127-148).

Covers the verifier-side artifacts byte-exactly — CommonCircuitData and
VerifierOnly/VerifierCircuitData — which is what an external (Rust) verifier
consumes together with a serialized proof. Full prover data (generators)
round-trips via pickle (see CircuitData round-trip helpers).
"""

from __future__ import annotations

import struct

from plonky2_tpu.fri.config import FriConfig, FriParams, FriReductionStrategy
from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
from plonky2_tpu.gates.arithmetic_extension import ArithmeticExtensionGate, MulExtensionGate
from plonky2_tpu.gates.base_sum import BaseSumGate
from plonky2_tpu.gates.coset_interpolation import CosetInterpolationGate
from plonky2_tpu.gates.exponentiation import ExponentiationGate
from plonky2_tpu.gates.lookup import LookupGate, LookupTableGate
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.gates.poseidon_mds import PoseidonMdsGate
from plonky2_tpu.gates.random_access import RandomAccessGate
from plonky2_tpu.gates.reducing import ReducingExtensionGate, ReducingGate
from plonky2_tpu.gates.simple_gates import ConstantGate, NoopGate, PublicInputGate
from plonky2_tpu.plonk.circuit_data import (
    CommonCircuitData,
    SelectorsInfo,
    VerifierOnlyCircuitData,
)
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.serialization import Reader, Writer

# DefaultGateSerializer registry order (reference gate_serialization.rs:130-148)
GATE_TAGS = [
    ArithmeticGate,
    ArithmeticExtensionGate,
    BaseSumGate,  # <2>
    ConstantGate,
    CosetInterpolationGate,
    ExponentiationGate,
    LookupGate,
    LookupTableGate,
    MulExtensionGate,
    NoopGate,
    PoseidonMdsGate,
    PoseidonGate,
    PublicInputGate,
    RandomAccessGate,
    ReducingExtensionGate,
    ReducingGate,
]


class CircuitWriter(Writer):
    def write_bool(self, b: bool) -> None:
        self.write_u8(1 if b else 0)

    def write_u16(self, x: int) -> None:
        self.buf += struct.pack("<H", x)

    def write_u32(self, x: int) -> None:
        self.buf += struct.pack("<I", x)

    def write_usize_vec(self, v) -> None:
        self.write_usize(len(v))
        for x in v:
            self.write_usize(x)

    def write_fri_reduction_strategy(self, rs: FriReductionStrategy) -> None:
        if rs.kind == "fixed":
            self.write_u8(0)
            self.write_usize_vec(list(rs.fixed))
        elif rs.kind == "constant_arity":
            self.write_u8(1)
            self.write_usize(rs.arity_bits)
            self.write_usize(rs.final_poly_bits)
        else:  # MinSize
            self.write_u8(2)
            if rs.max_arity_bits is not None:
                self.write_u8(1)
                self.write_usize(rs.max_arity_bits)
            else:
                self.write_u8(0)

    def write_fri_config(self, cfg: FriConfig) -> None:
        self.write_usize(cfg.rate_bits)
        self.write_usize(cfg.cap_height)
        self.write_usize(cfg.num_query_rounds)
        self.write_u32(cfg.proof_of_work_bits)
        self.write_fri_reduction_strategy(cfg.reduction_strategy)

    def write_fri_params(self, p: FriParams) -> None:
        self.write_fri_config(p.config)
        self.write_usize_vec(list(p.reduction_arity_bits))
        self.write_usize(p.degree_bits)
        self.write_bool(p.hiding)

    def write_circuit_config(self, c: CircuitConfig) -> None:
        self.write_usize(c.num_wires)
        self.write_usize(c.num_routed_wires)
        self.write_usize(c.num_constants)
        self.write_usize(c.security_bits)
        self.write_usize(c.num_challenges)
        self.write_usize(c.max_quotient_degree_factor)
        self.write_bool(c.use_base_arithmetic_gate)
        self.write_bool(c.zero_knowledge)
        self.write_fri_config(c.fri_config)

    def write_selectors_info(self, si: SelectorsInfo) -> None:
        self.write_usize_vec(si.selector_indices)
        self.write_usize(len(si.groups))
        for gr in si.groups:
            self.write_usize(gr.start)
            self.write_usize(gr.stop)

    def write_lut(self, lut) -> None:
        self.write_usize(len(lut))
        for a, b in lut:
            self.write_u16(a)
            self.write_u16(b)

    def write_gate(self, gate, common) -> None:
        tag = next(
            (i for i, cls in enumerate(GATE_TAGS) if type(gate) is cls), None
        )
        assert tag is not None, f"unsupported gate {gate.id()}"
        self.write_u32(tag)
        if isinstance(gate, (ArithmeticGate, ArithmeticExtensionGate, MulExtensionGate)):
            self.write_usize(gate.num_ops)
        elif isinstance(gate, BaseSumGate):
            assert gate.base == 2, "registry tag covers BaseSumGate<2>"
            self.write_usize(gate.num_limbs)
        elif isinstance(gate, ConstantGate):
            self.write_usize(gate.num_consts)
        elif isinstance(gate, CosetInterpolationGate):
            self.write_usize(gate.subgroup_bits)
            self.write_usize(gate.degree())
            self.write_usize(len(gate.barycentric_weights))
            self.write_field_vec(gate.barycentric_weights)
        elif isinstance(gate, ExponentiationGate):
            self.write_usize(gate.num_power_bits)
        elif isinstance(gate, LookupGate):
            self.write_usize(gate.num_slots)
            self.write_usize(common.luts.index(gate.lut))
            self.buf += gate.lut_hash
        elif isinstance(gate, LookupTableGate):
            self.write_usize(gate.num_slots)
            self.write_usize(gate.last_lut_row)
            self.write_usize(common.luts.index(gate.lut))
            self.buf += gate.lut_hash
        elif isinstance(gate, RandomAccessGate):
            self.write_usize(gate.bits)
            self.write_usize(gate.num_copies)
            self.write_usize(gate.num_extra_constants)
        elif isinstance(gate, (ReducingGate, ReducingExtensionGate)):
            self.write_usize(gate.num_coeffs)
        # Noop/PoseidonMds/Poseidon/PublicInput: empty payload

    def write_common_circuit_data(self, common: CommonCircuitData) -> None:
        self.write_circuit_config(common.config)
        self.write_fri_params(common.fri_params)
        self.write_selectors_info(common.selectors_info)
        self.write_usize(common.quotient_degree_factor)
        self.write_usize(common.num_gate_constraints)
        self.write_usize(common.num_constants)
        self.write_usize(common.num_public_inputs)
        self.write_usize(len(common.k_is))
        self.write_field_vec(common.k_is)
        self.write_usize(common.num_partial_products)
        self.write_usize(common.num_lookup_polys)
        self.write_usize(common.num_lookup_selectors)
        self.write_usize(len(common.luts))
        for lut in common.luts:
            self.write_lut(lut)
        self.write_usize(len(common.gates))
        for gate in common.gates:
            self.write_gate(gate, common)

    def write_verifier_only_circuit_data(self, vd: VerifierOnlyCircuitData) -> None:
        cap_height = (len(vd.constants_sigmas_cap) - 1).bit_length()
        self.write_usize(cap_height)
        self.write_merkle_cap(vd.constants_sigmas_cap)
        self.write_hash(vd.circuit_digest)

    def write_verifier_circuit_data(self, verifier_only, common) -> None:
        self.write_verifier_only_circuit_data(verifier_only)
        self.write_common_circuit_data(common)


class CircuitReader(Reader):
    def read_bool(self) -> bool:
        return self.read_u8() != 0

    def read_u16(self) -> int:
        (x,) = struct.unpack_from("<H", self.data, self.pos)
        self.pos += 2
        return x

    def read_u32(self) -> int:
        (x,) = struct.unpack_from("<I", self.data, self.pos)
        self.pos += 4
        return x

    def read_usize_vec(self) -> list[int]:
        return [self.read_usize() for _ in range(self.read_usize())]

    def read_fri_reduction_strategy(self) -> FriReductionStrategy:
        kind = self.read_u8()
        if kind == 0:
            return FriReductionStrategy.Fixed(tuple(self.read_usize_vec()))
        if kind == 1:
            return FriReductionStrategy.ConstantArityBits(
                self.read_usize(), self.read_usize()
            )
        return FriReductionStrategy.MinSize(
            self.read_usize() if self.read_u8() else None
        )

    def read_fri_config(self) -> FriConfig:
        rate_bits = self.read_usize()
        cap_height = self.read_usize()
        num_query_rounds = self.read_usize()
        pow_bits = self.read_u32()
        rs = self.read_fri_reduction_strategy()
        return FriConfig(rate_bits=rate_bits, cap_height=cap_height,
                         proof_of_work_bits=pow_bits, reduction_strategy=rs,
                         num_query_rounds=num_query_rounds)

    def read_fri_params(self) -> FriParams:
        config = self.read_fri_config()
        arity = tuple(self.read_usize_vec())
        degree_bits = self.read_usize()
        hiding = self.read_bool()
        return FriParams(config=config, hiding=hiding, degree_bits=degree_bits,
                         reduction_arity_bits=arity)

    def read_circuit_config(self) -> CircuitConfig:
        return CircuitConfig(
            num_wires=self.read_usize(),
            num_routed_wires=self.read_usize(),
            num_constants=self.read_usize(),
            security_bits=self.read_usize(),
            num_challenges=self.read_usize(),
            max_quotient_degree_factor=self.read_usize(),
            use_base_arithmetic_gate=self.read_bool(),
            zero_knowledge=self.read_bool(),
            fri_config=self.read_fri_config(),
        )

    def read_selectors_info(self) -> SelectorsInfo:
        indices = self.read_usize_vec()
        groups = [
            range(self.read_usize(), self.read_usize())
            for _ in range(self.read_usize())
        ]
        return SelectorsInfo(selector_indices=indices, groups=groups)

    def read_lut(self):
        return [(self.read_u16(), self.read_u16()) for _ in range(self.read_usize())]

    def read_gate(self, luts):
        tag = self.read_u32()
        cls = GATE_TAGS[tag]
        if cls in (ArithmeticGate, ArithmeticExtensionGate, MulExtensionGate):
            return cls(self.read_usize())
        if cls is BaseSumGate:
            return BaseSumGate(self.read_usize(), 2)
        if cls is ConstantGate:
            return ConstantGate(self.read_usize())
        if cls is CosetInterpolationGate:
            subgroup_bits = self.read_usize()
            degree = self.read_usize()
            weights = self.read_field_vec(self.read_usize())
            gate = CosetInterpolationGate(subgroup_bits, degree)
            assert gate.degree() == degree
            assert gate.barycentric_weights == weights
            return gate
        if cls is ExponentiationGate:
            return ExponentiationGate(self.read_usize())
        if cls is LookupGate:
            num_slots = self.read_usize()
            lut = luts[self.read_usize()]
            self.pos += 32  # lut hash (recomputed)
            return LookupGate(num_slots, lut)
        if cls is LookupTableGate:
            num_slots = self.read_usize()
            last_lut_row = self.read_usize()
            lut = luts[self.read_usize()]
            self.pos += 32
            return LookupTableGate(num_slots, lut, last_lut_row)
        if cls is RandomAccessGate:
            return RandomAccessGate(self.read_usize(), self.read_usize(), self.read_usize())
        if cls in (ReducingExtensionGate, ReducingGate):
            return cls(self.read_usize())
        return cls()  # Noop / PoseidonMds / Poseidon / PublicInput

    def read_common_circuit_data(self) -> CommonCircuitData:
        config = self.read_circuit_config()
        fri_params = self.read_fri_params()
        selectors_info = self.read_selectors_info()
        quotient_degree_factor = self.read_usize()
        num_gate_constraints = self.read_usize()
        num_constants = self.read_usize()
        num_public_inputs = self.read_usize()
        k_is = self.read_field_vec(self.read_usize())
        num_partial_products = self.read_usize()
        num_lookup_polys = self.read_usize()
        num_lookup_selectors = self.read_usize()
        luts = [self.read_lut() for _ in range(self.read_usize())]
        gates = [self.read_gate(luts) for _ in range(self.read_usize())]
        return CommonCircuitData(
            config=config, fri_params=fri_params, gates=gates,
            selectors_info=selectors_info,
            quotient_degree_factor=quotient_degree_factor,
            num_gate_constraints=num_gate_constraints,
            num_constants=num_constants, num_public_inputs=num_public_inputs,
            k_is=k_is, num_partial_products=num_partial_products,
            num_lookup_polys=num_lookup_polys,
            num_lookup_selectors=num_lookup_selectors, luts=luts,
        )

    def read_verifier_only_circuit_data(self) -> VerifierOnlyCircuitData:
        cap_height = self.read_usize()
        cap = self.read_merkle_cap(cap_height)
        digest = self.read_hash()
        return VerifierOnlyCircuitData(constants_sigmas_cap=cap, circuit_digest=digest)


def common_data_to_bytes(common: CommonCircuitData) -> bytes:
    w = CircuitWriter()
    w.write_common_circuit_data(common)
    return bytes(w.buf)


def common_data_from_bytes(data: bytes) -> CommonCircuitData:
    r = CircuitReader(data)
    common = r.read_common_circuit_data()
    assert r.pos == len(data)
    return common


def verifier_data_to_bytes(verifier_only, common) -> bytes:
    w = CircuitWriter()
    w.write_verifier_circuit_data(verifier_only, common)
    return bytes(w.buf)


def verifier_data_from_bytes(data: bytes, gc=None):
    r = CircuitReader(data)
    # VerifierOnly's cap is read before common and its hash encoding is
    # hasher-dependent (keccak digests are raw bytes); pass gc for
    # non-Poseidon configs (the reference encodes the hasher in the
    # GenericConfig type parameter, plonk/config.rs:95).
    if gc is not None:
        r.hasher = gc.hasher
    vd = r.read_verifier_only_circuit_data()
    common = r.read_common_circuit_data()
    common.gc = gc
    assert r.pos == len(data)
    return vd, common
