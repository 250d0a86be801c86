"""Recursion benchmark: inner proof of 2^size noop gates, then two recursion
layers shrinking it (reference plonky2/examples/bench_recursion.rs:294-349).
"""

from __future__ import annotations

import time

from plonky2_tpu.gates.simple_gates import NoopGate
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.recursion.recursive_verifier import (
    add_virtual_proof_with_pis,
    add_virtual_verifier_data,
    set_proof_with_pis_target,
    set_verifier_data_target,
    verify_proof,
)
from plonky2_tpu.util import TimingTree


def dummy_proof(config: CircuitConfig, log2_size: int):
    """Proof of a circuit with ~2^size noop gates
    (reference bench_recursion.rs:202-230)."""
    assert log2_size >= 1
    num_dummy_gates = 0 if log2_size == 1 else (1 if log2_size == 2 else (1 << (log2_size - 1)) + 1)
    builder = CircuitBuilder(config)
    for _ in range(num_dummy_gates):
        builder.add_gate(NoopGate(), [])
    data = builder.build()
    proof = data.prove(PartialWitness())
    data.verify(proof)
    return proof, data.verifier_only, data.common


def recursive_proof(inner, config: CircuitConfig, min_degree_bits: int | None = None,
                    timing: TimingTree | None = None, return_data: bool = False):
    """One recursion layer (reference bench_recursion.rs:240-292)."""
    inner_proof, inner_vd, inner_cd = inner
    builder = CircuitBuilder(config)
    pt = add_virtual_proof_with_pis(builder, inner_cd)
    vdt = add_virtual_verifier_data(builder, inner_cd.config.fri_config.cap_height)
    verify_proof(builder, pt, vdt, inner_cd)
    builder.register_public_inputs(pt.public_inputs)

    if min_degree_bits is not None:
        min_gates = (1 << (min_degree_bits - 1)) + 1
        while builder.num_gates() < min_gates:
            builder.add_gate(NoopGate(), [])

    data = builder.build()
    pw = PartialWitness()
    set_proof_with_pis_target(pw, pt, inner_proof)
    set_verifier_data_target(pw, vdt, inner_vd)
    proof = data.prove(pw, timing=timing)
    data.verify(proof)
    result = proof, data.verifier_only, data.common
    if return_data:
        return result, {"data": data, "pt": pt, "vdt": vdt}
    return result


def run_chain(size: int = 12, config: CircuitConfig | None = None, verbose: bool = True,
              repeats: int = 0):
    """Chain of three proofs: inner 2^size -> middle -> outer.

    First-build times include one-time costs (circuit construction, XLA
    tracing, compile-cache population). `repeats` re-proves the middle
    recursion circuit in-process afterwards — the steady-state prover
    latency a proving service sees (the reference's criterion bench also
    measures warm in-process iterations).
    """
    config = config or CircuitConfig.standard_recursion_config()
    timings = {}

    t0 = time.time()
    inner = dummy_proof(config, size)
    timings["inner"] = time.time() - t0
    if verbose:
        print(f"inner proof (2^{size} gates): {timings['inner']:.1f}s "
              f"degree 2^{inner[2].degree_bits}", flush=True)

    t0 = time.time()
    middle, middle_data = recursive_proof(inner, config, return_data=True)
    timings["middle"] = time.time() - t0
    if verbose:
        print(f"middle recursion layer: {timings['middle']:.1f}s "
              f"degree 2^{middle[2].degree_bits}", flush=True)

    t0 = time.time()
    outer = recursive_proof(middle, config)
    timings["outer"] = time.time() - t0
    if verbose:
        print(f"outer recursion layer: {timings['outer']:.1f}s "
              f"degree 2^{outer[2].degree_bits}", flush=True)

    if repeats:
        pw = PartialWitness()
        set_proof_with_pis_target(pw, middle_data["pt"], inner[0])
        set_verifier_data_target(pw, middle_data["vdt"], inner[1])
        best = float("inf")
        for r in range(repeats):
            t0 = time.time()
            proof = middle_data["data"].prove(pw)
            dt = time.time() - t0
            best = min(best, dt)
            if verbose:
                print(f"warm recursive prove[{r}]: {dt:.2f}s", flush=True)
        middle_data["data"].verify(proof)
        timings["warm_prove"] = best
        if verbose:
            print(f"steady-state recursive prove: {best:.2f}s "
                  f"({1.0/best:.2f} proofs/s)", flush=True)

    return outer, timings


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=12, help="log2 of inner gate count")
    p.add_argument("--repeats", type=int, default=0,
                   help="steady-state re-proves of the middle recursion layer")
    args = p.parse_args()
    run_chain(args.size, repeats=args.repeats)
    print("bench_recursion chain verified")


if __name__ == "__main__":
    main()
