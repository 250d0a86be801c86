"""Per-gate low-degree + device/scalar-equality checks
(reference test strategy, SURVEY.md §4 item 4)."""

import pytest

from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
from plonky2_tpu.gates.arithmetic_extension import (
    ArithmeticExtensionGate,
    MulExtensionGate,
)
from plonky2_tpu.gates.base_sum import BaseSumGate
from plonky2_tpu.gates.coset_interpolation import CosetInterpolationGate
from plonky2_tpu.gates.exponentiation import ExponentiationGate
from plonky2_tpu.gates.gate_testing import device_vs_scalar_check, low_degree_check
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.gates.poseidon_mds import PoseidonMdsGate
from plonky2_tpu.gates.random_access import RandomAccessGate
from plonky2_tpu.gates.reducing import ReducingExtensionGate, ReducingGate
from plonky2_tpu.gates.simple_gates import ConstantGate, NoopGate, PublicInputGate

GATES = [
    ArithmeticGate(num_ops=20),
    ArithmeticExtensionGate(num_ops=10),
    MulExtensionGate(num_ops=13),
    BaseSumGate(num_limbs=11, base=6),
    BaseSumGate(num_limbs=32, base=2),
    ConstantGate(num_consts=2),
    CosetInterpolationGate(subgroup_bits=2),
    CosetInterpolationGate(subgroup_bits=4, max_degree=6),
    ExponentiationGate(num_power_bits=17),
    NoopGate(),
    PoseidonGate(),
    PoseidonMdsGate(),
    PublicInputGate(),
    RandomAccessGate(bits=4, num_copies=4, num_extra_constants=2),
    ReducingGate(num_coeffs=21),
    ReducingExtensionGate(num_coeffs=12),
]


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:40])
def test_low_degree(gate):
    low_degree_check(gate)


@pytest.mark.parametrize("gate", GATES, ids=lambda g: g.id()[:40])
def test_device_vs_scalar(gate):
    device_vs_scalar_check(gate)
