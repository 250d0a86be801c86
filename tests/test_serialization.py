"""Proof serialization round-trip (reference util/serialization format)."""


def test_proof_roundtrip_factorial():
    from tests.test_plonk_e2e import build_factorial
    from plonky2_tpu.plonk.serialization import proof_from_bytes, proof_to_bytes

    data, pw = build_factorial()
    proof = data.prove(pw)
    blob = proof_to_bytes(proof)
    restored = proof_from_bytes(blob, data.common)
    assert restored == proof
    data.verify(restored)
    assert proof_to_bytes(restored) == blob


def test_circuit_data_roundtrip():
    """Verifier-side circuit data byte round-trip + verify from restored data
    (reference CircuitData serialization + fibonacci_serialization example)."""
    from tests.test_plonk_e2e import build_factorial
    from plonky2_tpu.plonk.circuit_serialization import (
        common_data_from_bytes,
        common_data_to_bytes,
        verifier_data_from_bytes,
        verifier_data_to_bytes,
    )
    from plonky2_tpu.plonk.serialization import proof_from_bytes, proof_to_bytes
    from plonky2_tpu.plonk.verifier import verify

    data, pw = build_factorial()
    proof = data.prove(pw)

    blob = common_data_to_bytes(data.common)
    restored = common_data_from_bytes(blob)
    assert restored == data.common
    assert common_data_to_bytes(restored) == blob

    vblob = verifier_data_to_bytes(data.verifier_only, data.common)
    vd, common = verifier_data_from_bytes(vblob)
    assert vd == data.verifier_only

    # verify entirely from serialized artifacts
    pblob = proof_to_bytes(proof)
    verify(proof_from_bytes(pblob, common), vd, common)


def test_lookup_circuit_data_roundtrip():
    from plonky2_tpu.gadgets.lookup import TIP5_TABLE
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.circuit_serialization import (
        common_data_from_bytes,
        common_data_to_bytes,
    )

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    lut = builder.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    inp = builder.add_virtual_target()
    builder.register_public_input(builder.add_lookup_from_index(inp, lut))
    builder.register_public_input(inp)
    data = builder.build()
    blob = common_data_to_bytes(data.common)
    restored = common_data_from_bytes(blob)
    assert restored == data.common


def test_compressed_proof_roundtrip():
    """Compress (path dedup + inferred-eval removal) -> decompress -> verify
    (reference CompressedProofWithPublicInputs)."""
    from tests.test_plonk_e2e import build_factorial
    from plonky2_tpu.plonk.compressed import compress, decompress, verify_compressed
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    data, pw = build_factorial()
    proof = data.prove(pw)
    compressed = compress(proof, data.verifier_only, data.common)

    # compression actually removed data
    full_siblings = sum(
        len(p.siblings)
        for q in proof.proof.opening_proof.query_round_proofs
        for _, p in q.initial_trees_proof.evals_proofs
    )
    comp_siblings = sum(
        len(p.siblings)
        for q in compressed.proof.opening_proof.query_round_proofs.initial_trees_proofs.values()
        for _, p in q.evals_proofs
    )
    assert comp_siblings < full_siblings

    verify_compressed(compressed, data.verifier_only, data.common)
    restored = decompress(compressed, data.verifier_only, data.common)
    assert restored == proof
