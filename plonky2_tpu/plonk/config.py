"""Circuit configuration (reference plonk/circuit_data.rs:62-141) and oracle
indices/blinding (reference plonk/plonk_common.rs:18-41)."""

from __future__ import annotations

from dataclasses import dataclass, field

from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy


@dataclass(frozen=True)
class GenericConfig:
    """Type-level config analog (reference plonk/config.rs:95-126):
    transcript/Merkle hasher + in-circuit (algebraic) hasher."""

    name: str
    hasher: object
    inner_hasher: object


def _poseidon_config() -> GenericConfig:
    from plonky2_tpu.hash.hashers import PoseidonHasher

    return GenericConfig("PoseidonGoldilocksConfig", PoseidonHasher, PoseidonHasher)


def _keccak_config() -> GenericConfig:
    from plonky2_tpu.hash.hashers import KeccakHasher, PoseidonHasher

    return GenericConfig("KeccakGoldilocksConfig", KeccakHasher, PoseidonHasher)


class _Lazy:
    _poseidon = None
    _keccak = None


def poseidon_goldilocks_config() -> GenericConfig:
    if _Lazy._poseidon is None:
        _Lazy._poseidon = _poseidon_config()
    return _Lazy._poseidon


def keccak_goldilocks_config() -> GenericConfig:
    if _Lazy._keccak is None:
        _Lazy._keccak = _keccak_config()
    return _Lazy._keccak


@dataclass(frozen=True)
class PlonkOracle:
    index: int
    blinding: bool


CONSTANTS_SIGMAS = PlonkOracle(0, False)
WIRES = PlonkOracle(1, True)
ZS_PARTIAL_PRODUCTS = PlonkOracle(2, True)
QUOTIENT = PlonkOracle(3, True)


@dataclass(frozen=True)
class CircuitConfig:
    num_wires: int = 135
    num_routed_wires: int = 80
    num_constants: int = 2
    use_base_arithmetic_gate: bool = True
    security_bits: int = 100
    num_challenges: int = 2
    zero_knowledge: bool = False
    max_quotient_degree_factor: int = 8
    fri_config: FriConfig = field(
        default_factory=lambda: FriConfig(
            rate_bits=3,
            cap_height=4,
            proof_of_work_bits=16,
            reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
            num_query_rounds=28,
        )
    )

    @staticmethod
    def standard_recursion_config() -> "CircuitConfig":
        return CircuitConfig()

    @staticmethod
    def standard_recursion_zk_config() -> "CircuitConfig":
        return CircuitConfig(zero_knowledge=True)

    @staticmethod
    def wide_ecc_config() -> "CircuitConfig":
        # reference circuit_data.rs:124-137
        return CircuitConfig(
            num_wires=234,
            num_routed_wires=80,
            num_constants=8,
            fri_config=FriConfig(
                rate_bits=3,
                cap_height=4,
                proof_of_work_bits=16,
                reduction_strategy=FriReductionStrategy.ConstantArityBits(4, 5),
                num_query_rounds=28,
            ),
        )
