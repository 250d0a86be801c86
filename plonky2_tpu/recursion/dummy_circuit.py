"""Dummy circuits and proofs (reference recursion/dummy_circuit.rs)."""

from __future__ import annotations

from plonky2_tpu.gates.simple_gates import NoopGate
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.recursion.recursive_verifier import (
    add_virtual_proof_with_pis,
    add_virtual_verifier_data,
    set_proof_with_pis_target,
    set_verifier_data_target,
)


def dummy_circuit(common_data, builder_cls=None):
    """Generate a circuit matching a given CommonCircuitData
    (reference dummy_circuit.rs:92-120)."""
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder

    assert not common_data.config.zero_knowledge, (
        "Degree calculation can be off if zero-knowledge is on."
    )
    degree = common_data.degree
    num_noop = degree - -(-common_data.num_public_inputs // 8) - 2

    builder = (builder_cls or CircuitBuilder)(common_data.config, gc=common_data.gc)
    for _ in range(num_noop):
        builder.add_gate(NoopGate(), [])
    for gate in common_data.gates:
        builder.gates.setdefault(gate.id(), gate)
    for _ in range(common_data.num_public_inputs):
        builder.register_public_input(builder.add_virtual_target())

    circuit = builder.build()
    assert circuit.common == common_data, "dummy circuit shape mismatch"
    return circuit


def dummy_proof(circuit, nonzero_public_inputs: dict[int, int] | None = None):
    """Proof of a dummy circuit with the given public-input overrides
    (reference dummy_circuit.rs:75-90)."""
    nonzero_public_inputs = nonzero_public_inputs or {}
    pw = PartialWitness()
    for i in range(circuit.common.num_public_inputs):
        pw.set_target(
            circuit.prover_only.public_inputs[i], nonzero_public_inputs.get(i, 0)
        )
    return circuit.prove(pw)


def cyclic_base_proof(common_data, verifier_data, nonzero_public_inputs=None):
    """Base proof for a cyclic recursion tree: arbitrary except the
    VK-encoding public inputs (reference dummy_circuit.rs:41-71)."""
    nonzero_public_inputs = dict(nonzero_public_inputs or {})
    pis_len = common_data.num_public_inputs
    cap_elements = 1 << common_data.config.fri_config.cap_height
    start_vk_pis = pis_len - 4 - 4 * cap_elements

    for j, v in enumerate(verifier_data.circuit_digest):
        nonzero_public_inputs[start_vk_pis + j] = v
    for i in range(cap_elements):
        start = start_vk_pis + 4 + 4 * i
        for j, v in enumerate(verifier_data.constants_sigmas_cap[i]):
            nonzero_public_inputs[start + j] = v

    return dummy_proof(dummy_circuit(common_data), nonzero_public_inputs)


class DummyProofGenerator(SimpleGenerator):
    """Fills a proof target with a concrete dummy proof at generation time
    (reference dummy_circuit.rs:160+)."""

    def __init__(self, proof_with_pis_target, proof_with_pis,
                 verifier_data_target, verifier_only, inner_common=None):
        self.proof_with_pis_target = proof_with_pis_target
        self.proof_with_pis = proof_with_pis
        self.verifier_data_target = verifier_data_target
        self.verifier_only = verifier_only
        # the dummy circuit's CommonCircuitData — needed to serialize this
        # generator (reference dummy_circuit.rs:289-293 ships the full
        # VerifierCircuitData, which includes common)
        self.inner_common = inner_common

    def dependencies(self):
        return []

    def outputs(self):
        # Enumerate by dry-running the same writer against a recorder.
        rec = _TargetRecorder()
        set_proof_with_pis_target(rec, self.proof_with_pis_target, self.proof_with_pis)
        set_verifier_data_target(rec, self.verifier_data_target, self.verifier_only)
        return rec.targets

    def run_once(self, witness, out):
        pw = _BufferWriter(out)
        set_proof_with_pis_target(pw, self.proof_with_pis_target, self.proof_with_pis)
        set_verifier_data_target(pw, self.verifier_data_target, self.verifier_only)


class _BufferWriter:
    """PartialWitness-like facade writing into a GeneratedValues buffer."""

    def __init__(self, out):
        self.out = out

    def set_target(self, t, v):
        self.out.set_target(t, v)

    def set_targets(self, ts, vs):
        for t, v in zip(ts, vs):
            self.out.set_target(t, v)

    def set_extension_target(self, et, v):
        for t, c in zip(et.parts, v):
            self.out.set_target(t, c)

    def set_hash_target(self, ht, v):
        for t, c in zip(ht, v):
            self.out.set_target(t, c)


def dummy_proof_and_vk(builder, common_data):
    """(proof target, vk target) backed by a DummyProofGenerator
    (reference dummy_circuit.rs:121-143)."""
    circuit = dummy_circuit(common_data)
    proof = dummy_proof(circuit)
    proof_t = add_virtual_proof_with_pis(builder, common_data)
    vk_t = add_virtual_verifier_data(builder, builder.config.fri_config.cap_height)
    builder.add_simple_generator(
        DummyProofGenerator(proof_t, proof, vk_t, circuit.verifier_only,
                            inner_common=circuit.common)
    )
    return proof_t, vk_t


class _TargetRecorder:
    """Records written targets (for DummyProofGenerator.outputs)."""

    def __init__(self):
        self.targets = []

    def set_target(self, t, v):
        self.targets.append(t)

    def set_targets(self, ts, vs):
        self.targets.extend(ts)

    def set_extension_target(self, et, v):
        self.targets.extend(et.parts)

    def set_hash_target(self, ht, v):
        self.targets.extend(ht)
