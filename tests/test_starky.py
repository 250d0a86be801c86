"""Starky Fibonacci STARK prove/verify (driver config 3;
reference starky/src/fibonacci_stark.rs tests)."""

import copy

import pytest

from plonky2_tpu.starky.config import StarkConfig
from plonky2_tpu.starky.fibonacci_stark import FibonacciStark, fibonacci
from plonky2_tpu.starky.prover import prove
from plonky2_tpu.starky.verifier import verify_stark_proof


@pytest.fixture(scope="module")
def fib_proof():
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    public_inputs = [0, 1, fibonacci(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(public_inputs[0], public_inputs[1])
    proof = prove(stark, config, trace, public_inputs)
    return stark, config, proof


def test_fibonacci_stark(fib_proof):
    stark, config, proof = fib_proof
    verify_stark_proof(stark, proof, config)


def test_fibonacci_stark_tampered_pi(fib_proof):
    stark, config, proof = fib_proof
    bad = copy.deepcopy(proof)
    bad.public_inputs[2] = (bad.public_inputs[2] + 1) % ((1 << 64) - (1 << 32) + 1)
    with pytest.raises(Exception):
        verify_stark_proof(stark, bad, config)


def test_fibonacci_stark_tampered_opening(fib_proof):
    stark, config, proof = fib_proof
    bad = copy.deepcopy(proof)
    v = bad.proof.openings.local_values[0]
    bad.proof.openings.local_values[0] = ((v[0] + 1) % ((1 << 64) - (1 << 32) + 1), v[1])
    with pytest.raises(Exception):
        verify_stark_proof(stark, bad, config)


def test_fibonacci_stark_degree():
    """Constraint-degree sanity: prove at a larger size."""
    num_rows = 1 << 7
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    public_inputs = [0, 1, fibonacci(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(public_inputs[0], public_inputs[1])
    proof = prove(stark, config, trace, public_inputs)
    verify_stark_proof(stark, proof, config)
