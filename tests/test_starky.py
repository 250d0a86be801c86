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


def test_lookup_stark():
    """logUp lookup STARK: a looked column + table + frequency columns
    (reference starky lookup machinery)."""
    from plonky2_tpu.field import scalar as fs2
    from plonky2_tpu.starky.test_starks import LookupTestStark

    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = LookupTestStark(num_rows)
    trace = stark.generate_trace()
    proof = prove(stark, config, trace, [])
    verify_stark_proof(stark, proof, config)

    # tamper: corrupt an aux opening
    import copy

    bad = copy.deepcopy(proof)
    v = bad.proof.openings.auxiliary_polys[0]
    bad.proof.openings.auxiliary_polys[0] = (fs2.add(v[0], 1), v[1])
    import pytest as _pytest

    with _pytest.raises(Exception):
        verify_stark_proof(stark, bad, config)


def test_permutation_and_unconstrained_starks():
    """reference permutation_stark.rs / unconstrained_stark.rs tests."""
    from plonky2_tpu.starky.stark_testing import (
        test_stark_constraints_on_trace,
        test_stark_low_degree,
    )
    from plonky2_tpu.starky.test_starks import PermutationStark, UnconstrainedStark

    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()

    stark = PermutationStark(num_rows)
    test_stark_low_degree(stark)
    pis = [3, 7]
    trace = stark.generate_trace(*pis)
    test_stark_constraints_on_trace(stark, trace, pis)
    proof = prove(stark, config, trace, pis)
    verify_stark_proof(stark, proof, config)

    stark = UnconstrainedStark(num_rows)
    proof = prove(stark, config, stark.generate_trace(), [])
    verify_stark_proof(stark, proof, config)


def test_fibonacci_stark_low_degree():
    from plonky2_tpu.starky.stark_testing import test_stark_low_degree

    test_stark_low_degree(FibonacciStark(1 << 3))


def test_fibonacci_stark_keccak_hasher():
    """Starky is generic over the hasher like the reference's C: GenericConfig
    (reference starky prove::<F, C, S, D>); drive it with Keccak-256."""
    from plonky2_tpu.hash.hashers import KeccakHasher

    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    public_inputs = [0, 1, fibonacci(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(public_inputs[0], public_inputs[1])
    proof = prove(stark, config, trace, public_inputs, hasher=KeccakHasher)
    verify_stark_proof(stark, proof, config, hasher=KeccakHasher)

    # a Poseidon-transcript verifier must reject it
    with pytest.raises(Exception):
        verify_stark_proof(stark, proof, config)


def test_fibonacci_stark_circuit_constraints():
    """Native vs in-circuit constraint evaluation (reference
    stark_testing.rs:76 test_stark_circuit_constraints)."""
    from plonky2_tpu.starky.stark_testing import test_stark_circuit_constraints

    test_stark_circuit_constraints(FibonacciStark(1 << 3), public_inputs=[0, 1, 21])
