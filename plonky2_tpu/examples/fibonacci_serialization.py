"""Circuit + proof serialization round-trip
(reference plonky2/examples/fibonacci_serialization.rs)."""

from __future__ import annotations

import pickle

from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.circuit_serialization import (
    common_data_from_bytes,
    common_data_to_bytes,
    verifier_data_from_bytes,
    verifier_data_to_bytes,
)
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.serialization import proof_from_bytes, proof_to_bytes
from plonky2_tpu.plonk.verifier import verify


def main():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    initial_a = builder.add_virtual_target()
    initial_b = builder.add_virtual_target()
    prev, cur = initial_a, initial_b
    for _ in range(99):
        prev, cur = cur, builder.add(prev, cur)
    builder.register_public_inputs([initial_a, initial_b, cur])

    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial_a, 0)
    pw.set_target(initial_b, 1)
    proof = data.prove(pw)

    # byte-format round trips (reference serialization format)
    proof_bytes = proof_to_bytes(proof)
    vd_bytes = verifier_data_to_bytes(data.verifier_only, data.common)
    print(f"proof: {len(proof_bytes)} bytes, verifier data: {len(vd_bytes)} bytes")

    vd, common = verifier_data_from_bytes(vd_bytes)
    verify(proof_from_bytes(proof_bytes, common), vd, common)
    print("verified from serialized artifacts")

    # full prover-side circuit data round-trips via pickle
    blob = pickle.dumps((data.common, data.verifier_only))
    common2, vd2 = pickle.loads(blob)
    assert common2 == data.common
    print("prover-side circuit data round-trips")


if __name__ == "__main__":
    main()
