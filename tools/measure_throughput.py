"""Measure batched/pipelined throughput proving (prove_many) on the real
chip: K warm middle-layer proves with deferred fetches vs sequential
`prove` calls. Uses the bench_cache warm-start artifacts. Usage:
    python tools/measure_throughput.py [K] [window]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_middle():
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.circuit_serialization import verifier_data_from_bytes
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.prover_serialization import circuit_data_from_bytes
    from plonky2_tpu.plonk.serialization import proof_from_bytes
    from plonky2_tpu.recursion.recursive_verifier import (
        add_virtual_proof_with_pis,
        add_virtual_verifier_data,
        set_proof_with_pis_target,
        set_verifier_data_target,
    )

    bc = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "bench_cache")
    with open(os.path.join(bc, "inner14.verifier.bin"), "rb") as f:
        inner_vd, inner_common = verifier_data_from_bytes(f.read())
    with open(os.path.join(bc, "inner14.proof.bin"), "rb") as f:
        inner_proof = proof_from_bytes(f.read(), inner_common)
    with open(os.path.join(bc, "middle14.circuit.bin"), "rb") as f:
        data = circuit_data_from_bytes(f.read())
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pt = add_virtual_proof_with_pis(b, inner_common)
    vdt = add_virtual_verifier_data(b, inner_common.config.fri_config.cap_height)
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vdt, inner_vd)
    return data, pw


def main():
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    window = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from plonky2_tpu.plonk.serialization import proof_to_bytes
    from plonky2_tpu.util import rng

    data, pw = load_middle()

    t0 = time.time()
    proof = data.prove(pw)
    print(f"first prove (in-process compiles): {time.time()-t0:.1f}s",
          flush=True)

    # sequential baseline (3 warm proves)
    seq_best = float("inf")
    for r in range(3):
        t0 = time.time()
        rng.seed(99)
        p_seq = data.prove(pw)
        seq_best = min(seq_best, time.time() - t0)
    print(f"sequential warm prove: {seq_best:.3f}s "
          f"({1/seq_best:.2f} proofs/s)", flush=True)

    # pipelined: K proves, same witness (byte-identity checkable)
    results = {}
    for w in (window, window + 2):
        t0 = time.time()
        rng.seed(99)
        proofs = data.prove_many([pw] * K, window=w)
        dt = time.time() - t0
        results[w] = dt
        print(f"prove_many K={K} window={w}: {dt:.3f}s total = "
              f"{dt/K:.3f}s/proof = {K/dt:.2f} proofs/s", flush=True)

    data.verify(proofs[0])
    data.verify(proofs[-1])
    rng.seed(99)
    p_one = data.prove(pw)
    ident = proof_to_bytes(p_one) == proof_to_bytes(proofs[0])
    rng.seed(None)
    print(json.dumps({
        "seq_warm_prove_s": round(seq_best, 3),
        "seq_proofs_per_s": round(1 / seq_best, 3),
        "batched": {str(w): {"total_s": round(dt, 3),
                             "proofs_per_s": round(K / dt, 3)}
                    for w, dt in results.items()},
        "K": K,
        "byte_identical_first": ident,
    }, indent=1))


if __name__ == "__main__":
    main()
