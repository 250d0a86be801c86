"""The standalone native (C++) verifier: an independent second
implementation of plonky2 verification written only from the serialized
byte formats (native/src/verifier.cc). It must accept every committed
Poseidon-config fixture, accept a freshly generated proof, and reject
tampered bytes.

Reference algorithm: plonk/verifier.rs:17-118, fri/verifier.rs:62-241,
plonk/get_challenges.rs:26-95; byte formats util/serialization/mod.rs.
"""

import pathlib
import random
import subprocess

import pytest

from plonky2_tpu import native

FIXTURES = pathlib.Path(__file__).resolve().parent.parent / "fixtures"
POSEIDON_FIXTURES = ["factorial", "fibonacci", "range_check", "square_root",
                     "bench_recursion"]


@pytest.fixture(scope="module")
def verifier_bin():
    path = native.verifier_binary()
    if path is None:
        pytest.skip("no C++ toolchain")
    return path


def _run(verifier_bin, vd, proof):
    return subprocess.run([verifier_bin, str(vd), str(proof)],
                          capture_output=True, text=True, timeout=120)


@pytest.mark.parametrize("name", POSEIDON_FIXTURES)
def test_cpp_verifier_accepts_fixture(verifier_bin, name):
    r = _run(verifier_bin, FIXTURES / f"{name}.verifier.bin",
             FIXTURES / f"{name}.proof.bin")
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "OK"


def test_cpp_verifier_accepts_keccak_fixture(verifier_bin):
    r = subprocess.run(
        [verifier_bin, "--keccak", str(FIXTURES / "keccak_factorial.verifier.bin"),
         str(FIXTURES / "keccak_factorial.proof.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "OK"


def test_cpp_verifier_rejects_tampered_keccak(verifier_bin, tmp_path):
    pb = bytearray((FIXTURES / "keccak_factorial.proof.bin").read_bytes())
    rng = random.Random(11)
    for _ in range(4):
        b = bytearray(pb)
        pos = rng.randrange(len(b))
        b[pos] ^= 1 << rng.randrange(8)
        t = tmp_path / "tampered_k.bin"
        t.write_bytes(bytes(b))
        r = subprocess.run(
            [verifier_bin, "--keccak",
             str(FIXTURES / "keccak_factorial.verifier.bin"), str(t)],
            capture_output=True, text=True, timeout=120)
        assert r.returncode != 0, f"tampered byte {pos} accepted"


def test_cpp_verifier_rejects_tampered(verifier_bin, tmp_path):
    pb = bytearray((FIXTURES / "factorial.proof.bin").read_bytes())
    rng = random.Random(7)
    for _ in range(8):
        b = bytearray(pb)
        pos = rng.randrange(len(b))
        b[pos] ^= 1 << rng.randrange(8)
        t = tmp_path / "tampered.bin"
        t.write_bytes(bytes(b))
        r = _run(verifier_bin, FIXTURES / "factorial.verifier.bin", t)
        assert r.returncode != 0, f"tampered byte {pos} accepted"


def test_cpp_verifier_accepts_stark_fixture(verifier_bin):
    """Round 4: the native verifier covers STARK proofs (FibonacciStark,
    standard_fast_config; reference starky/src/verifier.rs:30-215)."""
    r = subprocess.run(
        [verifier_bin, "--stark", str(FIXTURES / "starky_fibonacci.proof.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "OK"


def test_cpp_verifier_rejects_tampered_stark(verifier_bin, tmp_path):
    pb = bytearray((FIXTURES / "starky_fibonacci.proof.bin").read_bytes())
    rng = random.Random(13)
    for _ in range(6):
        b = bytearray(pb)
        pos = rng.randrange(len(b))
        b[pos] ^= 1 << rng.randrange(8)
        t = tmp_path / "tampered_s.bin"
        t.write_bytes(bytes(b))
        r = subprocess.run([verifier_bin, "--stark", str(t)],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode != 0, f"tampered byte {pos} accepted"


def test_cpp_verifier_accepts_compressed_fixture(verifier_bin):
    """Round 4: direct native verification of a COMPRESSED proof
    (Merkle-path dedup + inferred FRI evals, reference
    plonk/proof.rs:110-128) — decompression happens inside the C++
    binary, not via the Python verifier."""
    r = subprocess.run(
        [verifier_bin, "--compressed",
         str(FIXTURES / "factorial.verifier.bin"),
         str(FIXTURES / "factorial.compressed.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "OK"


def test_cpp_verifier_rejects_tampered_compressed(verifier_bin, tmp_path):
    pb = bytearray((FIXTURES / "factorial.compressed.bin").read_bytes())
    rng = random.Random(17)
    for _ in range(6):
        b = bytearray(pb)
        pos = rng.randrange(len(b))
        b[pos] ^= 1 << rng.randrange(8)
        t = tmp_path / "tampered_c.bin"
        t.write_bytes(bytes(b))
        r = subprocess.run(
            [verifier_bin, "--compressed",
             str(FIXTURES / "factorial.verifier.bin"), str(t)],
            capture_output=True, text=True, timeout=120)
        assert r.returncode != 0, f"tampered byte {pos} accepted"


def test_cpp_verifier_accepts_fresh_compressed_proof(verifier_bin, tmp_path):
    """Build + prove + compress in-process, byte-serialize, verify natively."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.circuit_data import CircuitConfig
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes
    from plonky2_tpu.plonk.serialization import compressed_proof_to_bytes

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    cur = x
    for i in range(700):
        cur = b.mul(cur, b.constant(i % 11 + 2))
    b.register_public_input(cur)
    data = b.build()
    assert len(data.common.fri_params.reduction_arity_bits) >= 1
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    comp = data.compress(proof)
    vd = tmp_path / "vd.bin"
    pf = tmp_path / "comp.bin"
    vd.write_bytes(verifier_data_to_bytes(data.verifier_only, data.common))
    pf.write_bytes(compressed_proof_to_bytes(comp, data.common))
    r = subprocess.run([verifier_bin, "--compressed", str(vd), str(pf)],
                       capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr


def test_cpp_verifier_accepts_fresh_proof(verifier_bin, tmp_path):
    """Full loop: build + prove in-process (including a lookup-free circuit
    with public inputs), serialize, verify with the native binary."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.circuit_data import CircuitConfig
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    cur = x
    for i in range(12):
        cur = b.mul(cur, b.constant(i + 2))
    b.register_public_input(cur)
    data = b.build()
    pw = PartialWitness()
    pw.set_target(x, 3)
    proof = data.prove(pw)
    data.verify(proof)

    vd = tmp_path / "vd.bin"
    pf = tmp_path / "proof.bin"
    vd.write_bytes(verifier_data_to_bytes(data.verifier_only, data.common))
    pf.write_bytes(proof_to_bytes(proof))
    r = _run(verifier_bin, vd, pf)
    assert r.returncode == 0, r.stderr


def test_cpp_verifier_accepts_permutation_stark(verifier_bin):
    """Round 5: the native STARK verification is generic over an AIR
    registry (reference starky/src/verifier.rs:30-68 is Stark-trait
    generic); PermutationStark is the second registered AIR."""
    r = subprocess.run(
        [verifier_bin, "--stark=permutation",
         str(FIXTURES / "starky_permutation.proof.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode == 0, r.stderr
    assert r.stdout.strip() == "OK"


def test_cpp_verifier_rejects_cross_air_stark(verifier_bin):
    """A proof verified under the WRONG AIR descriptor must fail (the
    constraint set is part of the statement)."""
    r = subprocess.run(
        [verifier_bin, "--stark=permutation",
         str(FIXTURES / "starky_fibonacci.proof.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode != 0
    r = subprocess.run(
        [verifier_bin, "--stark=fibonacci",
         str(FIXTURES / "starky_permutation.proof.bin")],
        capture_output=True, text=True, timeout=120)
    assert r.returncode != 0


def test_cpp_verifier_rejects_tampered_permutation_stark(verifier_bin,
                                                         tmp_path):
    pb = bytearray((FIXTURES / "starky_permutation.proof.bin").read_bytes())
    rng = random.Random(29)
    for _ in range(4):
        b = bytearray(pb)
        pos = rng.randrange(len(b))
        b[pos] ^= 1 << rng.randrange(8)
        t = tmp_path / "tampered_p.bin"
        t.write_bytes(bytes(b))
        r = subprocess.run([verifier_bin, "--stark=permutation", str(t)],
                           capture_output=True, text=True, timeout=120)
        assert r.returncode != 0, f"tampered byte {pos} accepted"
