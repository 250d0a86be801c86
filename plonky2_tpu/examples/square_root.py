"""Prove knowledge of a square root via a custom witness generator
(reference plonky2/examples/square_root.rs)."""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig


class SquareRootGenerator(SimpleGenerator):
    """Computes x = sqrt(x_squared) outside the circuit."""

    def __init__(self, x, x_squared):
        self.x = x
        self.x_squared = x_squared

    def dependencies(self):
        return [self.x_squared]

    def outputs(self):
        return [self.x]

    def run_once(self, witness, out):
        x_squared = witness.get_target(self.x_squared)
        x = fs.sqrt(x_squared)
        assert x is not None, "public input is not a quadratic residue"
        out.set_target(self.x, x)


def build_and_prove(x_value: int = 8846502094546981540):
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = builder.add_virtual_target()
    x_squared = builder.square(x)
    builder.register_public_input(x_squared)
    builder.add_simple_generator(SquareRootGenerator(x, x_squared))

    x_squared_value = fs.mul(x_value, x_value)
    pw = PartialWitness()
    pw.set_target(x_squared, x_squared_value)

    data = builder.build()
    proof = data.prove(pw)
    return data, proof, x_value


def main():
    data, proof, x_value = build_and_prove()
    print(f"Proved knowledge of sqrt({proof.public_inputs[0]})")
    data.verify(proof)
    print("verified")


if __name__ == "__main__":
    main()
