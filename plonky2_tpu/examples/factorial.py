"""Prove knowledge of 100! (reference plonky2/examples/factorial.rs)."""

from __future__ import annotations

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def build_and_prove():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    initial = builder.add_virtual_target()
    cur = initial
    for i in range(2, 101):
        cur = builder.mul(cur, builder.constant(i))
    builder.register_public_input(initial)
    builder.register_public_input(cur)

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial, 1)
    proof = data.prove(pw)
    return data, proof


def main():
    data, proof = build_and_prove()
    print(f"Factorial starting at {proof.public_inputs[0]} is {proof.public_inputs[1]}")
    data.verify(proof)
    print("verified")


if __name__ == "__main__":
    main()
