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


def test_variable_degree_stark_recursive():
    """ONE verifier circuit accepts STARK proofs of any degree in
    [min_degree_bits, max_degree_bits] (reference recursive_verifier.rs
    min_degree_bits_to_support / verify_fri_proof_with_multiple_degree_bits)."""
    from plonky2_tpu.starky.fibonacci_stark import FibonacciStark as FS

    from dataclasses import replace

    from plonky2_tpu.fri.config import FriConfig, FriReductionStrategy

    # 1 query round keeps the test circuit small (reference test does the
    # same); verifier_degree_bits must satisfy final_poly_coeff_len(max) =
    # 2^(final_poly_bits+1) so every smaller proof's final poly fits — for
    # ConstantArityBits(4, 5) that means degree bits in {6, 10, 14, ...}.
    base = StarkConfig.standard_fast_config()
    stark_config = replace(base, fri_config=replace(base.fri_config, num_query_rounds=1))
    max_db, min_db = 10, 4
    vc_fri_params = stark_config.fri_params(max_db)

    stark = FS(1 << max_db)
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_stark_proof_with_pis(builder, stark, stark_config, max_db,
                                          with_degree_target=True)
    verify_stark_proof_circuit(builder, stark, pt, stark_config, max_db,
                               min_degree_bits_to_support=min_db)
    builder.register_public_inputs(pt.public_inputs)
    data = builder.build()

    for db in (5, 7):
        n = 1 << db
        s = FS(n)
        pis = [0, 1, fibonacci(n - 1, 0, 1)]
        trace = s.generate_trace(pis[0], pis[1])
        pf = stark_prove(s, stark_config, trace, pis,
                         verifier_circuit_fri_params=vc_fri_params)
        verify_stark_proof(s, pf, stark_config,
                           verifier_circuit_fri_params=vc_fri_params)
        pw = PartialWitness()
        set_stark_proof_with_pis_target(pw, pt, pf, pis_degree_bits=db)
        proof = data.prove(pw)
        assert proof.public_inputs == pis
        data.verify(proof)
