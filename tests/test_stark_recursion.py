"""STARK -> SNARK: verify the Fibonacci STARK proof inside a plonky2 circuit
(reference starky/src/fibonacci_stark.rs recursive test)."""

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.starky.config import StarkConfig
from plonky2_tpu.starky.fibonacci_stark import FibonacciStark, fibonacci
from plonky2_tpu.starky.prover import prove as stark_prove
from plonky2_tpu.starky.recursive_verifier import (
    add_virtual_stark_proof_with_pis,
    set_stark_proof_with_pis_target,
    verify_stark_proof_circuit,
)
from plonky2_tpu.starky.verifier import verify_stark_proof


def test_fibonacci_stark_recursive():
    num_rows = 1 << 5
    stark_config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    pis = [0, 1, fibonacci(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(pis[0], pis[1])
    stark_pf = stark_prove(stark, stark_config, trace, pis)
    verify_stark_proof(stark, stark_pf, stark_config)
    degree_bits = stark_pf.proof.recover_degree_bits(stark_config)

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(builder, stark, stark_config, degree_bits)
    verify_stark_proof_circuit(builder, stark, pt, stark_config, degree_bits)
    builder.register_public_inputs(pt.public_inputs)

    data = builder.build()
    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, stark_pf)
    proof = data.prove(pw)
    assert proof.public_inputs == pis
    data.verify(proof)


def test_lookup_stark_recursive():
    """In-circuit verification of a STARK that uses logUp lookups
    (reference recursive_verifier.rs aux-polys path)."""
    from plonky2_tpu.starky.test_starks import LookupTestStark

    num_rows = 1 << 5
    stark_config = StarkConfig.standard_fast_config()
    stark = LookupTestStark(num_rows)
    trace = stark.generate_trace()
    stark_pf = stark_prove(stark, stark_config, trace, [])
    verify_stark_proof(stark, stark_pf, stark_config)
    degree_bits = stark_pf.proof.recover_degree_bits(stark_config)

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(builder, stark, stark_config, degree_bits)
    verify_stark_proof_circuit(builder, stark, pt, stark_config, degree_bits)

    data = builder.build()
    pw = PartialWitness()
    set_stark_proof_with_pis_target(pw, pt, stark_pf)
    proof = data.prove(pw)
    data.verify(proof)
