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
    import numpy as np

    from plonky2_tpu.field import scalar as fs2
    from plonky2_tpu.starky.lookup import Column, Filter, Lookup
    from plonky2_tpu.starky.stark import Stark

    class LookupTestStark(Stark):
        COLUMNS = 3  # [val, table, freq]
        PUBLIC_INPUTS = 0

        def __init__(self, num_rows):
            self.num_rows = num_rows

        def generate_trace(self):
            n = self.num_rows
            rng = np.random.default_rng(0)
            table = np.arange(n, dtype=np.uint64)
            vals = rng.integers(0, n, size=n)
            freq = np.bincount(vals, minlength=n).astype(np.uint64)
            return np.stack([vals.astype(np.uint64), table, freq])

        def eval(self, ops, frame, consumer):
            # the lookup argument carries the whole statement
            pass

        def constraint_degree(self):
            return 3

        def lookups(self):
            return [Lookup(
                columns=[Column.single(0)],
                table_column=Column.single(1),
                frequencies_column=Column.single(2),
                filter_columns=[Filter.default()],
            )]

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
