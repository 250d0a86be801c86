"""Gate test kit (reference gates/gate_testing.rs:24-87).

- low_degree_check: random wire/constant polynomials of degree < n are
  evaluated through the gate's constraints over a large subgroup; an iNTT
  then certifies every constraint polynomial's degree is within the gate's
  claimed degree bound.
- device_vs_scalar: the batched device evaluation (eval_unfiltered_device)
  must agree pointwise with the generic-ops scalar evaluation — the analog
  of the reference's native/circuit equality test, for our two backends.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from plonky2_tpu.field import ntt, scalar as fs
from plonky2_tpu.gates.ops import EvaluationVars, HostBaseOps
from plonky2_tpu.util import log2_ceil


def _random_eval_grid(gate, n_bits: int, rng):
    """Random degree < n wire/constant polys evaluated on the big domain."""
    n = 1 << n_bits
    big_bits = n_bits + log2_ceil(max(gate.degree(), 1))
    big_n = 1 << big_bits
    rate_bits = big_bits - n_bits

    num_wires = gate.num_wires()
    num_constants = gate.num_constants()
    coeffs = rng.integers(0, fs.P, size=(num_wires + num_constants, n), dtype=np.uint64)
    values = np.asarray(ntt.lde_fft(jnp.asarray(coeffs), rate_bits, shift=1))
    return values[:num_wires], values[num_wires:], big_n, n


def low_degree_check(gate, n_bits: int = 2, seed: int = 0) -> None:
    rng = np.random.default_rng(seed)
    wires, constants, big_n, n = _random_eval_grid(gate, n_bits, rng)
    pi_hash = jnp.zeros((4,), dtype=jnp.uint64)
    ev = np.asarray(
        gate.eval_unfiltered_device(jnp.asarray(wires), jnp.asarray(constants), pi_hash)
    )
    assert ev.shape[0] == gate.num_constraints(), (
        f"{gate.id()}: {ev.shape[0]} constraints != claimed {gate.num_constraints()}"
    )
    if ev.shape[0] == 0:
        return
    coeffs = np.asarray(ntt.ifft(jnp.asarray(ev)))
    # constraint degree bound: gate.degree() * (n - 1)
    max_deg = gate.degree() * (n - 1)
    tail = coeffs[:, max_deg + 1:]
    bad = np.nonzero(tail.any(axis=1))[0]
    assert bad.size == 0, (
        f"{gate.id()}: constraints {bad.tolist()} exceed degree {gate.degree()}"
    )


def device_vs_scalar_check(gate, num_points: int = 4, seed: int = 1) -> None:
    rng = np.random.default_rng(seed)
    num_wires = gate.num_wires()
    num_constants = gate.num_constants()
    wires = rng.integers(0, fs.P, size=(num_wires, num_points), dtype=np.uint64)
    constants = rng.integers(0, fs.P, size=(num_constants, num_points), dtype=np.uint64)
    pi_hash_np = rng.integers(0, fs.P, size=(4,), dtype=np.uint64)

    dev = np.asarray(
        gate.eval_unfiltered_device(
            jnp.asarray(wires), jnp.asarray(constants), jnp.asarray(pi_hash_np)
        )
    )

    ops = HostBaseOps()
    for p in range(num_points):
        vars = EvaluationVars(
            [int(constants[i, p]) for i in range(num_constants)],
            [int(wires[i, p]) for i in range(num_wires)],
            [int(h) for h in pi_hash_np],
        )
        expected = gate.eval_unfiltered(ops, vars)
        got = [int(v) for v in dev[:, p]]
        assert got == [int(e) for e in expected], (
            f"{gate.id()}: device/scalar mismatch at point {p}"
        )
