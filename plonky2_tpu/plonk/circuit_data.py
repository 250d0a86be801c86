"""Circuit data: common / prover-only / verifier-only
(reference plonk/circuit_data.rs:161-680)."""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from plonky2_tpu.fri.config import FriParams
from plonky2_tpu.fri.structure import (
    FriBatchInfo,
    FriInstanceInfo,
    FriOracleInfo,
    FriPolynomialInfo,
)
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.plonk import config as pcfg
from plonky2_tpu.plonk.config import CircuitConfig


@dataclass
class SelectorsInfo:
    selector_indices: list[int]
    groups: list[range]

    @property
    def num_selectors(self) -> int:
        return len(self.groups)


@dataclass
class CommonCircuitData:
    config: CircuitConfig
    fri_params: FriParams
    gates: list  # Gate instances (types), sorted by (degree, id)
    selectors_info: SelectorsInfo
    quotient_degree_factor: int
    num_gate_constraints: int
    num_constants: int
    num_public_inputs: int
    k_is: list[int]
    num_partial_products: int
    num_lookup_polys: int = 0
    num_lookup_selectors: int = 0
    luts: list = field(default_factory=list)
    # GenericConfig; None -> PoseidonGoldilocksConfig. Not consensus data
    # (the reference CommonCircuitData has no such field) -> excluded from eq.
    gc: Any = field(default=None, compare=False)

    def generic_config(self):
        if self.gc is None:
            return pcfg.poseidon_goldilocks_config()
        return self.gc

    @property
    def degree_bits(self) -> int:
        return self.fri_params.degree_bits

    @property
    def degree(self) -> int:
        return 1 << self.degree_bits

    @property
    def lde_size(self) -> int:
        return self.fri_params.lde_size

    def constraint_degree(self) -> int:
        return max(g.degree() for g in self.gates)

    @property
    def quotient_degree(self) -> int:
        return self.quotient_degree_factor * self.degree

    # poly index ranges within commitments
    def constants_range(self) -> range:
        return range(0, self.num_constants)

    def sigmas_range(self) -> range:
        return range(self.num_constants, self.num_constants + self.config.num_routed_wires)

    def zs_range(self) -> range:
        return range(0, self.config.num_challenges)

    def partial_products_range(self) -> range:
        return range(self.config.num_challenges,
                     (self.num_partial_products + 1) * self.config.num_challenges)

    def lookup_range(self) -> range:
        start = self.num_zs_partial_products_polys()
        return range(start, start + self.num_all_lookup_polys())

    def num_preprocessed_polys(self) -> int:
        return self.sigmas_range().stop

    def num_zs_partial_products_polys(self) -> int:
        return self.config.num_challenges * (1 + self.num_partial_products)

    def num_all_lookup_polys(self) -> int:
        return self.config.num_challenges * self.num_lookup_polys

    def num_quotient_polys(self) -> int:
        return self.config.num_challenges * self.quotient_degree_factor

    # FRI instance
    def fri_preprocessed_polys(self):
        return FriPolynomialInfo.from_range(
            pcfg.CONSTANTS_SIGMAS.index, range(0, self.num_preprocessed_polys()))

    def fri_wire_polys(self):
        return FriPolynomialInfo.from_range(pcfg.WIRES.index, range(0, self.config.num_wires))

    def fri_zs_partial_products_polys(self):
        return FriPolynomialInfo.from_range(
            pcfg.ZS_PARTIAL_PRODUCTS.index, range(0, self.num_zs_partial_products_polys()))

    def fri_zs_polys(self):
        return FriPolynomialInfo.from_range(pcfg.ZS_PARTIAL_PRODUCTS.index, self.zs_range())

    def fri_lookup_polys(self):
        return FriPolynomialInfo.from_range(pcfg.ZS_PARTIAL_PRODUCTS.index, self.lookup_range())

    def fri_quotient_polys(self):
        return FriPolynomialInfo.from_range(pcfg.QUOTIENT.index, range(0, self.num_quotient_polys()))

    def fri_all_polys(self):
        return (self.fri_preprocessed_polys() + self.fri_wire_polys()
                + self.fri_zs_partial_products_polys() + self.fri_quotient_polys()
                + self.fri_lookup_polys())

    def fri_next_batch_polys(self):
        return self.fri_zs_polys() + self.fri_lookup_polys()

    def fri_oracles(self):
        return [
            FriOracleInfo(self.num_preprocessed_polys(), pcfg.CONSTANTS_SIGMAS.blinding),
            FriOracleInfo(self.config.num_wires, pcfg.WIRES.blinding),
            FriOracleInfo(
                self.num_zs_partial_products_polys() + self.num_all_lookup_polys(),
                pcfg.ZS_PARTIAL_PRODUCTS.blinding,
            ),
            FriOracleInfo(self.num_quotient_polys(), pcfg.QUOTIENT.blinding),
        ]

    def get_fri_instance(self, zeta: tuple) -> FriInstanceInfo:
        zeta_batch = FriBatchInfo(point=zeta, polynomials=self.fri_all_polys())
        g = fs.primitive_root_of_unity(self.degree_bits)
        zeta_next = fs.ext_scalar_mul(g, zeta)
        zeta_next_batch = FriBatchInfo(point=zeta_next, polynomials=self.fri_next_batch_polys())
        return FriInstanceInfo(oracles=self.fri_oracles(),
                               batches=[zeta_batch, zeta_next_batch])


@dataclass
class ProverOnlyCircuitData:
    generators: list
    generator_indices_by_watches: dict[int, list[int]]
    constants_sigmas_commitment: Any  # PolynomialBatch
    sigmas: Any  # [num_routed, degree] u64 numpy (transposed per-row access on host)
    subgroup: list[int]
    public_inputs: list
    representative_map: list[int]
    circuit_digest: list[int]
    # device-cached domain tables for the quotient pass
    quotient_domain_tables: Any = None
    lookup_rows: list = field(default_factory=list)
    lut_to_lookups: list = field(default_factory=list)


@dataclass
class VerifierOnlyCircuitData:
    constants_sigmas_cap: list[list[int]]
    circuit_digest: list[int]


@dataclass
class MockCircuitData:
    """Witness-generation-only circuit data (no proving key material) —
    reference plonk/circuit_data.rs:145."""

    prover_only: ProverOnlyCircuitData
    common: CommonCircuitData

    def generate_witness(self, inputs):
        from plonky2_tpu.iop.generator import generate_partial_witness

        return generate_partial_witness(inputs, self.prover_only, self.common)


@dataclass
class ProverCircuitData:
    """Proving-only circuit data (reference plonk/circuit_data.rs:256-297)."""

    prover_only: ProverOnlyCircuitData
    common: CommonCircuitData

    def prove(self, inputs, timing=None):
        from plonky2_tpu.plonk.prover import prove

        return prove(self.prover_only, self.common, inputs, timing=timing)

    def prove_many(self, inputs_list, timing=None, window=3, threads=2):
        from plonky2_tpu.plonk.prover import prove_many

        return prove_many(self.prover_only, self.common, inputs_list,
                          timing=timing, window=window, threads=threads)

    def to_bytes(self, registry=None) -> bytes:
        from plonky2_tpu.plonk.prover_serialization import prover_data_to_bytes

        return prover_data_to_bytes(self.prover_only, self.common, registry)

    @staticmethod
    def from_bytes(data: bytes, registry=None) -> "ProverCircuitData":
        from plonky2_tpu.plonk.prover_serialization import prover_data_from_bytes

        prover_only, common = prover_data_from_bytes(data, registry)
        return ProverCircuitData(prover_only=prover_only, common=common)


@dataclass
class VerifierCircuitData:
    """Verification-only circuit data (reference plonk/circuit_data.rs:299-337)."""

    verifier_only: VerifierOnlyCircuitData
    common: CommonCircuitData

    def verify(self, proof_with_pis) -> None:
        from plonky2_tpu.plonk.verifier import verify

        verify(proof_with_pis, self.verifier_only, self.common)

    def to_bytes(self) -> bytes:
        from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes

        return verifier_data_to_bytes(self.verifier_only, self.common)

    @staticmethod
    def from_bytes(data: bytes, gc=None) -> "VerifierCircuitData":
        from plonky2_tpu.plonk.circuit_serialization import verifier_data_from_bytes

        verifier_only, common = verifier_data_from_bytes(data, gc=gc)
        return VerifierCircuitData(verifier_only=verifier_only, common=common)


@dataclass
class CircuitData:
    prover_only: ProverOnlyCircuitData
    verifier_only: VerifierOnlyCircuitData
    common: CommonCircuitData

    def prover_data(self) -> "ProverCircuitData":
        return ProverCircuitData(prover_only=self.prover_only, common=self.common)

    def verifier_data(self) -> "VerifierCircuitData":
        return VerifierCircuitData(verifier_only=self.verifier_only, common=self.common)

    def mock(self) -> "MockCircuitData":
        return MockCircuitData(prover_only=self.prover_only, common=self.common)

    def prove(self, inputs, timing=None):
        from plonky2_tpu.plonk.prover import prove

        return prove(self.prover_only, self.common, inputs, timing=timing)

    def prove_many(self, inputs_list, timing=None, window=3, threads=2):
        """Pipelined/threaded throughput proving of many witnesses of this
        circuit (byte-identical to sequential prove calls); see
        prover.prove_many."""
        from plonky2_tpu.plonk.prover import prove_many

        return prove_many(self.prover_only, self.common, inputs_list,
                          timing=timing, window=window, threads=threads)

    def verify(self, proof_with_pis) -> None:
        from plonky2_tpu.plonk.verifier import verify

        verify(proof_with_pis, self.verifier_only, self.common)

    def compress(self, proof_with_pis):
        """Merkle path dedup + inferred-element removal
        (reference circuit_data.rs:206-215)."""
        from plonky2_tpu.plonk.compressed import compress

        return compress(proof_with_pis, self.verifier_only, self.common)

    def decompress(self, compressed_proof):
        from plonky2_tpu.plonk.compressed import decompress

        return decompress(compressed_proof, self.verifier_only, self.common)

    def verify_compressed(self, compressed_proof) -> None:
        from plonky2_tpu.plonk.compressed import verify_compressed

        verify_compressed(compressed_proof, self.verifier_only, self.common)

    def to_bytes(self, registry=None) -> bytes:
        """Full circuit data incl. prover side
        (reference circuit_data.rs:170-178)."""
        from plonky2_tpu.plonk.prover_serialization import circuit_data_to_bytes

        return circuit_data_to_bytes(self, registry)

    @staticmethod
    def from_bytes(data: bytes, registry=None) -> "CircuitData":
        from plonky2_tpu.plonk.prover_serialization import circuit_data_from_bytes

        return circuit_data_from_bytes(data, registry)
