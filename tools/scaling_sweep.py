"""Device-count scaling sweep — the TPU dual of the reference's rayon
thread-count sweep (`bench_recursion --threads a..=b`,
reference plonky2/examples/bench_recursion.rs:372-393).

Runs the full sharded prover on a recursion-sized circuit (degree 2^12,
FRI arities (4, 4)) under meshes of 1/2/4/8 devices, asserts every mesh
size produces BYTE-IDENTICAL proofs (the structure check: GSPMD resharding
never changes the math), and records warm prove times per device count.

On this image only virtual CPU devices exist
(`XLA_FLAGS=--xla_force_host_platform_device_count=8`), so the recorded
times validate the harness structure, not TPU scaling — CPU "devices" are
threads of one host sharing memory bandwidth, and XLA:CPU collectives are
memcpys. On a real multi-chip TPU slice the same sweep (driven from
bench.py's scaling hook) yields proofs/s per chip count and the 1->N
efficiency number BASELINE.md asks for.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/scaling_sweep.py [--sizes 1,2,4,8] [--out SCALING.json]
"""

from __future__ import annotations

import argparse
import json
import time


def build_circuit():
    from plonky2_tpu.gates.simple_gates import NoopGate
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.circuit_data import CircuitConfig

    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    cur = x
    for i in range(40):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(cur)
    for _ in range(3500):
        b.add_gate(NoopGate(), [])
    data = b.build()
    assert data.common.degree_bits >= 12
    assert len(data.common.fri_params.reduction_arity_bits) >= 2
    return data, x


def sweep(mesh_sizes, warm_repeats=2):
    import jax

    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.parallel import make_mesh, use_mesh
    from plonky2_tpu.plonk.serialization import proof_to_bytes
    from plonky2_tpu.util import rng

    n_avail = len(jax.devices())
    mesh_sizes = [n for n in mesh_sizes if n <= n_avail]

    data, x = build_circuit()
    results = []
    ref_bytes = None
    for n in mesh_sizes:
        # XLA:CPU aborts/segfaults once too many compiled executables
        # accumulate in-process (root-caused round 2, commit b274749);
        # each mesh size recompiles everything anyway, so drop them.
        jax.clear_caches()
        ctx = use_mesh(make_mesh(n)) if n > 1 else _null_ctx()
        times = []
        with ctx:
            for r in range(warm_repeats + 1):
                pw = PartialWitness()
                pw.set_target(x, 5)
                rng.seed(1234)
                t0 = time.perf_counter()
                proof = data.prove(pw)
                times.append(time.perf_counter() - t0)
        rng.seed(None)
        data.verify(proof)
        raw = proof_to_bytes(proof)
        if ref_bytes is None:
            ref_bytes = raw
        assert raw == ref_bytes, f"mesh size {n} changed the proof bytes"
        warm = min(times[1:]) if len(times) > 1 else times[0]
        results.append({
            "devices": n,
            "warm_prove_s": round(warm, 3),
            "proofs_per_s": round(1.0 / warm, 3),
            "cold_prove_s": round(times[0], 3),
            "bytes_identical": True,
        })
        print(json.dumps(results[-1]), flush=True)

    base = results[0]["proofs_per_s"] if results else 0.0
    for r in results:
        r["efficiency_vs_1"] = (round(r["proofs_per_s"] / (base * r["devices"]), 3)
                                if base else 0.0)
    return {
        "platform": jax.devices()[0].platform,
        "degree_bits": data.common.degree_bits,
        "arities": list(data.common.fri_params.reduction_arity_bits),
        "warm_repeats": warm_repeats,
        "results": results,
    }


class _null_ctx:
    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

    p = argparse.ArgumentParser()
    p.add_argument("--sizes", default="1,2,4,8")
    p.add_argument("--out", default="SCALING.json")
    p.add_argument("--repeats", type=int, default=2)
    p.add_argument("--real", action="store_true",
                   help="use the attached accelerator devices as-is "
                        "(default: virtual 8-device CPU mesh — the only "
                        "multi-device option on a single-chip host)")
    args = p.parse_args()

    if not args.real:
        os.environ.setdefault("XLA_FLAGS",
                              "--xla_force_host_platform_device_count=8")
        import jax

        jax.config.update("jax_platforms", "cpu")
    sizes = [int(s) for s in args.sizes.split(",")]
    out = sweep(sizes, args.repeats)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
