"""Cyclic recursion (IVC) hash-chain validation — the reference
cyclic_recursion.rs test. Slow (~15 min CPU); run directly:
    python tests/validation_cyclic.py
(Named without the test_ prefix so the default pytest run stays fast.)"""

import sys, os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

import plonky2_tpu  # noqa: E402
from plonky2_tpu.gates.simple_gates import NoopGate  # noqa: E402
from plonky2_tpu.hash import poseidon as ps  # noqa: E402
from plonky2_tpu.iop.witness import PartialWitness  # noqa: E402
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder  # noqa: E402
from plonky2_tpu.plonk.config import CircuitConfig  # noqa: E402
from plonky2_tpu.recursion.cyclic_recursion import (  # noqa: E402
    add_verifier_data_public_inputs,
    check_cyclic_proof_verifier_data,
    conditionally_verify_cyclic_proof_or_dummy,
)
from plonky2_tpu.recursion.dummy_circuit import cyclic_base_proof  # noqa: E402
from plonky2_tpu.recursion.recursive_verifier import (  # noqa: E402
    add_virtual_proof_with_pis,
    add_virtual_verifier_data,
    set_proof_with_pis_target,
    set_verifier_data_target,
    verify_proof,
)


def common_data_for_recursion():
    config = CircuitConfig.standard_recursion_config()
    builder = CircuitBuilder(config)
    data = builder.build()
    for level in range(2):
        builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
        pt = add_virtual_proof_with_pis(builder, data.common)
        vdt = add_virtual_verifier_data(builder, config.fri_config.cap_height)
        verify_proof(builder, pt, vdt, data.common)
        if level == 1:
            while builder.num_gates() < (1 << 12):
                builder.add_gate(NoopGate(), [])
        data = builder.build()
        print(f"common_data level {level + 1}: degree 2^{data.common.degree_bits}",
              flush=True)
    return data.common


def main():
    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    one = builder.one()

    # Hash-chain circuit (reference cyclic_recursion.rs test):
    # PIs: initial hash (4), chain tip (4), counter (1), then the VK.
    initial_hash = builder.add_virtual_hash()
    builder.register_public_inputs(initial_hash)
    current_hash_in = builder.add_virtual_hash()
    current_hash_out = builder.hash_n_to_hash_no_pad(list(current_hash_in))
    builder.register_public_inputs(current_hash_out)
    counter = builder.add_virtual_public_input()

    common_data = common_data_for_recursion()
    verifier_data_target = add_verifier_data_public_inputs(builder)
    common_data.num_public_inputs = builder.num_public_inputs()

    condition = builder.add_virtual_bool_target_safe()

    inner = add_virtual_proof_with_pis(builder, common_data)
    inner_pis = inner.public_inputs
    inner_initial_hash = inner_pis[0:4]
    inner_latest_hash = inner_pis[4:8]
    inner_counter = inner_pis[8]

    builder.connect_hashes(initial_hash, inner_initial_hash)
    actual_hash_in = builder.select_hash(condition, inner_latest_hash, initial_hash)
    builder.connect_hashes(current_hash_in, actual_hash_in)
    new_counter = builder.mul_add(condition.target, inner_counter, one)
    builder.connect(counter, new_counter)

    conditionally_verify_cyclic_proof_or_dummy(builder, condition, inner, common_data)

    print(f"cyclic circuit gates: {builder.num_gates()}", flush=True)
    data = builder.build()
    print(f"cyclic circuit degree: 2^{data.common.degree_bits}", flush=True)

    initial = [0, 1, 2, 3]

    # Base case.
    pw = PartialWitness()
    pw.set_bool_target(condition, False)
    set_proof_with_pis_target(
        pw, inner,
        cyclic_base_proof(common_data, data.verifier_only, dict(enumerate(initial))),
    )
    set_verifier_data_target(pw, verifier_data_target, data.verifier_only)
    proof = data.prove(pw)
    check_cyclic_proof_verifier_data(proof, data.verifier_only, data.common)
    data.verify(proof)
    print("base case OK, counter =", proof.public_inputs[8], flush=True)

    # Two recursive layers.
    for layer in (1, 2):
        pw = PartialWitness()
        pw.set_bool_target(condition, True)
        set_proof_with_pis_target(pw, inner, proof)
        set_verifier_data_target(pw, verifier_data_target, data.verifier_only)
        proof = data.prove(pw)
        check_cyclic_proof_verifier_data(proof, data.verifier_only, data.common)
        data.verify(proof)
        print(f"layer {layer} OK, counter = {proof.public_inputs[8]}", flush=True)

    # Verify the hash chain tip.
    h = initial
    for _ in range(proof.public_inputs[8]):
        h = ps.hash_no_pad(h)
    assert proof.public_inputs[4:8] == h, "hash chain mismatch"
    print("CYCLIC IVC CHAIN VERIFIED, counter =", proof.public_inputs[8], flush=True)


if __name__ == "__main__":
    main()
