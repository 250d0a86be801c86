"""Differential fuzzing of the two independent verifiers.

Generates random circuits (seeded, deterministic): random gate/gadget
mixes — arithmetic chains, exponentiation, bit decomposition, range
checks, selects, random access, in-circuit Poseidon hashing, lookups —
under random configs (zk on/off, Poseidon vs Keccak transcript), proves
each with the Python/TPU stack, then:

  1. verifies with the Python verifier,
  2. round-trips the COMPRESSED proof (compress -> verify_compressed ->
     decompress == original),
  3. serializes proof + verifier data to the reference byte format
     (util/serialization/mod.rs:55-120) and verifies with the standalone
     C++ binary (native/src/verifier.cc) — an implementation written only
     from the byte formats, so agreement is strong cross-implementation
     evidence of bit-exactness.

Used by tests/test_verifier_fuzz.py; run standalone for a bigger campaign:
    python tools/fuzz_verifiers.py --seeds 25
"""

from __future__ import annotations

import random


def random_circuit_and_proof(seed: int):
    """Build a random circuit + witness, prove, and return
    (data, proof, is_keccak). Deterministic in `seed`."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.field import scalar as fs
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig, keccak_goldilocks_config
    from plonky2_tpu.util import rng

    r = random.Random(seed)
    use_keccak = r.random() < 0.3
    zk = r.random() < 0.3
    config = (CircuitConfig.standard_recursion_zk_config() if zk
              else CircuitConfig.standard_recursion_config())
    if use_keccak:
        b = CircuitBuilder(config, gc=keccak_goldilocks_config())
    else:
        b = CircuitBuilder(config)

    pw = PartialWitness()
    inputs = []
    for _ in range(r.randint(1, 4)):
        t = b.add_virtual_target()
        pw.set_target(t, r.randrange(fs.P))
        inputs.append(t)
    pool = list(inputs) + [b.constant(r.randrange(fs.P)) for _ in range(3)]

    def pick():
        return r.choice(pool)

    n_ops = r.randint(20, 120)
    for _ in range(n_ops):
        op = r.randrange(12)
        if op == 0:
            pool.append(b.add(pick(), pick()))
        elif op == 1:
            pool.append(b.mul(pick(), pick()))
        elif op == 2:
            pool.append(b.sub(pick(), pick()))
        elif op == 3:
            pool.append(b.mul_add(pick(), pick(), pick()))
        elif op == 4:
            pool.append(b.exp_u64(pick(), r.randrange(1, 1 << 20)))
        elif op == 5:
            # nonzero w.h.p.: x^2 + random nonzero constant
            x = b.add_const(b.square(pick()), r.randrange(1, fs.P))
            pool.append(b.inverse(x))
        elif op == 6:
            cond = b.is_equal(pick(), pick())
            pool.append(b.select(cond, pick(), pick()))
        elif op == 7:
            t = b.add_virtual_target()
            n_log = r.randrange(1, 30)
            pw.set_target(t, r.randrange(1 << n_log))
            b.range_check(t, n_log)
            pool.append(t)
        elif op == 8:
            bits = b.split_le(pick(), 64)
            pool.append(bits[r.randrange(len(bits))].target)
        elif op == 9:
            digest = b.hash_n_to_hash_no_pad(
                [pick() for _ in range(r.randint(1, 9))])
            pool.extend(digest)
        elif op == 10:
            idx = b.add_virtual_target()
            k = r.choice([2, 4, 8])
            pw.set_target(idx, r.randrange(k))
            pool.append(b.random_access(idx, [pick() for _ in range(k)]))
        else:
            pool.append(b.mul_const_add(r.randrange(fs.P), pick(), pick()))

    if r.random() < 0.35:
        n_entries = r.choice([8, 16, 64])
        lut = b.add_lookup_table_from_table(
            list(range(n_entries)),
            [r.randrange(1 << 16) for _ in range(n_entries)])
        for _ in range(r.randint(1, 5)):
            t = b.add_virtual_target()
            pw.set_target(t, r.randrange(n_entries))
            pool.append(b.add_lookup_from_index(t, lut))

    for _ in range(r.randint(1, 6)):
        b.register_public_input(pick())

    data = b.build()
    rng.seed(seed * 7919 + 13)  # pin salts/fills -> reproducible
    proof = data.prove(pw)
    rng.seed(None)
    return data, proof, use_keccak


def fuzz_one(seed: int, verifier_bin=None, tmpdir=None) -> dict:
    """Prove one random circuit and cross-verify. Returns a summary dict;
    raises on any mismatch."""
    import os
    import subprocess

    from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    data, proof, use_keccak = random_circuit_and_proof(seed)
    data.verify(proof)

    # compressed round trip (reference plonk/proof.rs:110-128)
    comp = data.compress(proof)
    data.verify_compressed(comp)
    rt = data.decompress(comp)
    assert proof_to_bytes(rt) == proof_to_bytes(proof), (
        f"seed {seed}: compress/decompress round trip changed bytes")

    info = {
        "seed": seed,
        "degree_bits": data.common.degree_bits,
        "keccak": use_keccak,
        "zk": data.common.config.zero_knowledge,
        "gates": [g.id().split("(")[0] for g in data.common.gates],
        "cpp": None,
    }

    if verifier_bin is not None:
        assert tmpdir is not None
        pb = os.path.join(tmpdir, f"fuzz_{seed}.proof.bin")
        vb = os.path.join(tmpdir, f"fuzz_{seed}.verifier.bin")
        with open(pb, "wb") as f:
            f.write(proof_to_bytes(proof))
        with open(vb, "wb") as f:
            f.write(verifier_data_to_bytes(data.verifier_only, data.common))
        cmd = [verifier_bin] + (["--keccak"] if use_keccak else []) + [vb, pb]
        res = subprocess.run(cmd, capture_output=True, text=True, timeout=300)
        assert res.returncode == 0 and res.stdout.strip() == "OK", (
            f"seed {seed}: C++ verifier rejected a valid proof: "
            f"{res.stderr or res.stdout}")
        info["cpp"] = "OK"

        # direct native verification of the COMPRESSED byte format
        # (decompression inside the binary) — Poseidon configs only (the
        # C++ keccak path does not cover path-compressed digests)
        if not use_keccak:
            from plonky2_tpu.plonk.serialization import compressed_proof_to_bytes

            cb = os.path.join(tmpdir, f"fuzz_{seed}.compressed.bin")
            with open(cb, "wb") as f:
                f.write(compressed_proof_to_bytes(comp, data.common))
            res = subprocess.run([verifier_bin, "--compressed", vb, cb],
                                 capture_output=True, text=True, timeout=300)
            assert res.returncode == 0 and res.stdout.strip() == "OK", (
                f"seed {seed}: C++ verifier rejected a valid COMPRESSED "
                f"proof: {res.stderr or res.stdout}")
            info["cpp_compressed"] = "OK"
    return info


def fuzz_stark(seed: int, verifier_bin=None, tmpdir=None) -> dict:
    """Prove a random-size STARK (alternating FibonacciStark /
    PermutationStark — both AIRs in the C++ registry) and cross-verify
    natively."""
    import os
    import subprocess

    from plonky2_tpu.starky.config import StarkConfig
    from plonky2_tpu.starky.fibonacci_stark import FibonacciStark, fibonacci
    from plonky2_tpu.starky.prover import prove
    from plonky2_tpu.starky.serialization import stark_proof_to_bytes
    from plonky2_tpu.starky.test_starks import PermutationStark
    from plonky2_tpu.starky.verifier import verify_stark_proof

    r = random.Random(seed)
    log_rows = r.choice([5, 6, 7])
    x0, x1 = r.randrange(1 << 32), r.randrange(1 << 32)
    num_rows = 1 << log_rows
    config = StarkConfig.standard_fast_config()
    air = "fibonacci" if seed % 2 == 0 else "permutation"
    if air == "fibonacci":
        stark = FibonacciStark(num_rows)
        public_inputs = [x0, x1, fibonacci(num_rows - 1, x0, x1)]
    else:
        stark = PermutationStark(num_rows)
        public_inputs = [x0, x1]
    trace = stark.generate_trace(x0, x1)
    proof = prove(stark, config, trace, public_inputs)
    verify_stark_proof(stark, proof, config)
    info = {"seed": seed, "stark": air, "log_rows": log_rows,
            "cpp": None}
    if verifier_bin is not None:
        assert tmpdir is not None
        pb = os.path.join(tmpdir, f"fuzz_stark_{seed}.proof.bin")
        with open(pb, "wb") as f:
            f.write(stark_proof_to_bytes(proof, config))
        res = subprocess.run([verifier_bin, f"--stark={air}", pb],
                             capture_output=True, text=True, timeout=300)
        assert res.returncode == 0 and res.stdout.strip() == "OK", (
            f"stark seed {seed} ({air}): C++ verifier rejected a valid "
            f"proof: {res.stderr or res.stdout}")
        info["cpp"] = "OK"
    return info


def main():
    import argparse
    import os
    import sys
    import tempfile

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    jax.config.update("jax_platforms", "cpu")

    from plonky2_tpu import native

    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=25)
    p.add_argument("--start", type=int, default=0)
    args = p.parse_args()

    vbin = native.verifier_binary()
    with tempfile.TemporaryDirectory() as td:
        for seed in range(args.start, args.start + args.seeds):
            info = fuzz_one(seed, vbin, td)
            print(info, flush=True)
        for seed in range(min(args.seeds, 5)):
            info = fuzz_stark(seed, vbin, td)
            print(info, flush=True)
    print(f"all {args.seeds} random circuits cross-verified")


if __name__ == "__main__":
    main()
