"""Range-check a public value (reference plonky2/examples/range_check.rs)."""

from __future__ import annotations

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


def build_and_prove(value: int = 12345678):
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    builder.range_check(x, 32)
    builder.register_public_input(x)

    pw = PartialWitness()
    pw.set_target(x, value)

    data = builder.build()
    proof = data.prove(pw)
    return data, proof


def main():
    data, proof = build_and_prove()
    print(f"Value {proof.public_inputs[0]} is less than 2^32")
    data.verify(proof)
    print("verified")


if __name__ == "__main__":
    main()
