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
