"""Tensorized gate device evals match the generic ops-protocol evaluation
exactly (values AND constraint order) on random wires."""

import numpy as np
import jax.numpy as jnp
import pytest

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.gates.arithmetic_base import ArithmeticGate
from plonky2_tpu.gates.arithmetic_extension import (
    ArithmeticExtensionGate,
    MulExtensionGate,
)
from plonky2_tpu.gates.base_sum import BaseSumGate
from plonky2_tpu.gates.coset_interpolation import CosetInterpolationGate
from plonky2_tpu.gates.exponentiation import ExponentiationGate
from plonky2_tpu.gates.poseidon_mds import PoseidonMdsGate
from plonky2_tpu.gates.poseidon_gate import PoseidonGate
from plonky2_tpu.gates.random_access import RandomAccessGate
from plonky2_tpu.gates.reducing import ReducingGate, ReducingExtensionGate

Q = 8


def _check(gate, num_constants=0):
    rng = np.random.default_rng(hash(gate.id()) % (1 << 32))
    wires = jnp.asarray(rng.integers(0, fs.P, size=(135, Q), dtype=np.uint64))
    consts = jnp.asarray(
        rng.integers(0, fs.P, size=(max(num_constants, 1), Q), dtype=np.uint64))
    pi = jnp.asarray(rng.integers(0, fs.P, size=(4,), dtype=np.uint64))
    got = np.asarray(gate.eval_unfiltered_device(wires, consts, pi))
    ref = np.asarray(Gate.eval_unfiltered_device(gate, wires, consts, pi))
    assert got.shape == ref.shape == (gate.num_constraints(), Q)
    assert (got == ref).all(), gate.id()


@pytest.mark.parametrize("gate,nc", [
    (ArithmeticGate(20), 2),
    (ArithmeticExtensionGate(10), 2),
    (MulExtensionGate(13), 1),
    (BaseSumGate(63, 2), 0),
    (BaseSumGate(32, 4), 0),
    (ReducingGate(43), 0),
    (ReducingGate(1), 0),
    (ReducingExtensionGate(32), 0),
    (ReducingExtensionGate(1), 0),
    (RandomAccessGate(4, 4, 2), 2),
    (RandomAccessGate(2, 10, 0), 0),
    (CosetInterpolationGate(2), 0),
    (CosetInterpolationGate(4, 8), 0),
    (CosetInterpolationGate(4, 6), 0),
    (CosetInterpolationGate(4, 2), 0),
    (CosetInterpolationGate(3, 4), 0),
    (ExponentiationGate(17), 0),
    (ExponentiationGate(1), 0),
    (PoseidonMdsGate(), 0),
    (PoseidonGate(), 0),
], ids=lambda g: getattr(g, "id", lambda: str(g))() if isinstance(g, Gate) else str(g))
def test_device_eval_matches_generic(gate, nc):
    _check(gate, nc)
