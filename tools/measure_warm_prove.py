"""Measure the warm middle-layer re-prove (the bench headline) on the real
chip, with per-phase TimingTree breakdown. Uses the bench_cache warm-start
artifacts (tools/make_bench_cache.py). Usage:
    python tools/measure_warm_prove.py [repeats]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    from plonky2_tpu.examples.bench_recursion import _phase_dict
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
    from plonky2_tpu.util import TimingTree

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

    t0 = time.time()
    proof = data.prove(pw)
    print(f"first prove (in-process compiles): {time.time()-t0:.1f}s",
          flush=True)
    best = None
    for r in range(repeats):
        tt = TimingTree("warm prove")
        t0 = time.time()
        proof = data.prove(pw, timing=tt)
        dt = time.time() - t0
        print(f"repeat {r}: {dt:.3f}s", flush=True)
        if best is None or dt < best[0]:
            best = (dt, _phase_dict(tt))
    data.verify(proof)
    print(json.dumps({"warm_prove_s": round(best[0], 3),
                      "proofs_per_s": round(1.0 / best[0], 3),
                      "phases": best[1]}, indent=1))


if __name__ == "__main__":
    main()
