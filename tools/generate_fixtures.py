"""Generate bit-exactness fixtures for the five driver configs
(BASELINE.json `configs`): proof bytes + verifier-data bytes under pinned
prover-randomness seeds, committed in-tree at fixtures/.

These are the artifacts an external verifier consumes. Proof bytes follow
the reference serialization format (util/serialization/mod.rs:55-120); see
fixtures/README.md for the one-command Rust verification recipe (no Rust
toolchain exists in this image, so cross-validation runs wherever one does).

Run: python tools/generate_fixtures.py   (CPU, ~minutes; deterministic)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "fixtures")

SEED = 2026


def _write(name: str, blob: bytes) -> None:
    path = os.path.join(FIXTURES, name)
    with open(path, "wb") as f:
        f.write(blob)
    print(f"  {name}: {len(blob)} bytes")


def plonk_fixture(name: str, build_and_prove, compressed: bool = False):
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes
    from plonky2_tpu.plonk.serialization import (
        compressed_proof_to_bytes,
        proof_to_bytes,
    )
    from plonky2_tpu.util import rng

    print(name)
    rng.seed(SEED)
    data, proof, *_ = build_and_prove()
    rng.seed(None)
    data.verify(proof)
    _write(f"{name}.proof.bin", proof_to_bytes(proof))
    _write(f"{name}.verifier.bin",
           verifier_data_to_bytes(data.verifier_only, data.common))
    if compressed:
        comp = data.compress(proof)
        data.verify_compressed(comp)
        _write(f"{name}.compressed.bin",
               compressed_proof_to_bytes(comp, data.common))


def starky_fixture():
    from plonky2_tpu.starky.config import StarkConfig
    from plonky2_tpu.starky.fibonacci_stark import FibonacciStark, fibonacci
    from plonky2_tpu.starky.prover import prove
    from plonky2_tpu.starky.serialization import stark_proof_to_bytes
    from plonky2_tpu.starky.verifier import verify_stark_proof

    print("starky_fibonacci")
    num_rows = 1 << 5
    config = StarkConfig.standard_fast_config()
    stark = FibonacciStark(num_rows)
    public_inputs = [0, 1, fibonacci(num_rows - 1, 0, 1)]
    trace = stark.generate_trace(public_inputs[0], public_inputs[1])
    proof = prove(stark, config, trace, public_inputs)
    verify_stark_proof(stark, proof, config)
    _write("starky_fibonacci.proof.bin", stark_proof_to_bytes(proof, config))

    from plonky2_tpu.starky.test_starks import PermutationStark

    print("starky_permutation")
    stark_p = PermutationStark(num_rows)
    pis = [3, 9]
    trace_p = stark_p.generate_trace(pis[0], pis[1])
    proof_p = prove(stark_p, config, trace_p, pis)
    verify_stark_proof(stark_p, proof_p, config)
    _write("starky_permutation.proof.bin", stark_proof_to_bytes(proof_p, config))


def bench_recursion_fixture():
    from plonky2_tpu.examples.bench_recursion import dummy_proof, recursive_proof
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.serialization import proof_to_bytes
    from plonky2_tpu.util import rng

    print("bench_recursion (inner 2^4 -> middle -> outer)")
    config = CircuitConfig.standard_recursion_config()
    rng.seed(SEED)
    inner = dummy_proof(config, 4)
    middle = recursive_proof(inner, config)
    outer_proof, outer_vd, outer_common = recursive_proof(middle, config)
    rng.seed(None)
    _write("bench_recursion.proof.bin", proof_to_bytes(outer_proof))
    _write("bench_recursion.verifier.bin",
           verifier_data_to_bytes(outer_vd, outer_common))


def main():
    os.makedirs(FIXTURES, exist_ok=True)

    from plonky2_tpu.examples import factorial, fibonacci, range_check, square_root

    plonk_fixture("factorial", factorial.build_and_prove, compressed=True)
    plonk_fixture("fibonacci", fibonacci.build_and_prove)
    plonk_fixture("range_check", range_check.build_and_prove)
    plonk_fixture("square_root", square_root.build_and_prove)

    def keccak_factorial():
        from plonky2_tpu.iop.witness import PartialWitness
        from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
        from plonky2_tpu.plonk.config import CircuitConfig, keccak_goldilocks_config

        builder = CircuitBuilder(
            CircuitConfig.standard_recursion_config(), gc=keccak_goldilocks_config()
        )
        initial = builder.add_virtual_target()
        cur = initial
        for i in range(2, 40):
            cur = builder.mul(cur, builder.constant(i))
        builder.register_public_input(initial)
        builder.register_public_input(cur)
        data = builder.build()
        pw = PartialWitness()
        pw.set_target(initial, 1)
        return data, data.prove(pw)

    plonk_fixture("keccak_factorial", keccak_factorial)
    starky_fixture()
    bench_recursion_fixture()
    print("done ->", FIXTURES)


if __name__ == "__main__":
    main()
