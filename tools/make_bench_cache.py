"""Build and serialize the bench warm-start artifacts: the inner 2^SIZE
dummy proof (+ verifier data) and the middle recursion CircuitData, so
bench.py in a fresh driver process can skip the ~25 min of cold builds and
go straight to the warm middle-layer re-proves that define the headline
metric (three driver rounds starved on exactly this cold start).

The cached artifacts are deterministic: the inner circuit is all noops,
the middle circuit is the canonical recursive verifier over it, and
restored circuits prove byte-identically (tests/test_prover_serialization).
After writing, the tool restores everything the way bench.py will and
proves + verifies once as validation.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/make_bench_cache.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, "bench_cache")
SIZE = 14


def main():
    from plonky2_tpu.examples.bench_recursion import dummy_proof, recursive_proof
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_to_bytes
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.prover_serialization import circuit_data_to_bytes
    from plonky2_tpu.plonk.serialization import proof_to_bytes

    os.makedirs(CACHE, exist_ok=True)
    config = CircuitConfig.standard_recursion_config()

    t0 = time.time()
    inner = dummy_proof(config, SIZE)
    print(f"inner 2^{SIZE}: {time.time()-t0:.1f}s degree "
          f"2^{inner[2].degree_bits}", flush=True)
    t0 = time.time()
    middle, md = recursive_proof(inner, config, return_data=True)
    print(f"middle: {time.time()-t0:.1f}s degree "
          f"2^{middle[2].degree_bits}", flush=True)

    def w(name, blob):
        with open(os.path.join(CACHE, name), "wb") as f:
            f.write(blob)
        print(f"  {name}: {len(blob)} bytes", flush=True)

    w(f"inner{SIZE}.proof.bin", proof_to_bytes(inner[0]))
    w(f"inner{SIZE}.verifier.bin", verifier_data_to_bytes(inner[1], inner[2]))
    w(f"middle{SIZE}.circuit.bin", circuit_data_to_bytes(md["data"]))

    # validate the exact restore path bench.py uses
    sys.path.insert(0, REPO)
    import bench

    cached = bench._load_cached_middle()
    assert cached is not None, "cache failed to load back"
    data, pt, vdt, inner_proof, inner_vd = cached
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.recursion.recursive_verifier import (
        set_proof_with_pis_target,
        set_verifier_data_target,
    )

    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vdt, inner_vd)
    t0 = time.time()
    proof = data.prove(pw)
    data.verify(proof)
    print(f"restored middle proves+verifies: {time.time()-t0:.1f}s", flush=True)
    # NOTE: proof BYTES legitimately differ run to run — unconstrained
    # wires take fresh prover-rng values (reference RandomValueGenerator);
    # verification is the correctness bar.
    print("bench cache OK ->", CACHE)


if __name__ == "__main__":
    main()
