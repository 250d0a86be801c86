"""Prove the 100th Fibonacci number (reference plonky2/examples/fibonacci.rs)."""

from __future__ import annotations

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def build_and_prove():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    initial_a = builder.add_virtual_target()
    initial_b = builder.add_virtual_target()
    prev, cur = initial_a, initial_b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)

    builder.register_public_input(initial_a)
    builder.register_public_input(initial_b)
    builder.register_public_input(cur)

    pw = PartialWitness()
    pw.set_target(initial_a, 0)
    pw.set_target(initial_b, 1)

    data = builder.build()
    proof = data.prove(pw)
    return data, proof


def main():
    data, proof = build_and_prove()
    print(
        f"100th Fibonacci number mod |F| (starting with {proof.public_inputs[0]}, "
        f"{proof.public_inputs[1]}) is: {proof.public_inputs[2]}"
    )
    data.verify(proof)
    print("verified")


if __name__ == "__main__":
    main()
