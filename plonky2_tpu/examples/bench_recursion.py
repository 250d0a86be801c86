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


def _num_dummy_gates(log2_size: int) -> int:
    assert log2_size >= 1
    return 0 if log2_size == 1 else (1 if log2_size == 2 else (1 << (log2_size - 1)) + 1)


def dummy_proof(config: CircuitConfig, log2_size: int):
    """Proof of a circuit with ~2^size noop gates
    (reference bench_recursion.rs:202-230)."""
    builder = CircuitBuilder(config)
    for _ in range(_num_dummy_gates(log2_size)):
        builder.add_gate(NoopGate(), [])
    data = builder.build()
    proof = data.prove(PartialWitness())
    data.verify(proof)
    return proof, data.verifier_only, data.common


def dummy_lookup_proof(config: CircuitConfig, log2_size: int):
    """2^size-gate proof containing one lookup into the TIP5 table
    (reference bench_recursion.rs:107-149, --lookup_type 1)."""
    from plonky2_tpu.gadgets.lookup import TIP5_TABLE

    builder = CircuitBuilder(config)
    tip5_idx = builder.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    initial_a = builder.add_virtual_target()
    builder.add_lookup_from_index(initial_a, tip5_idx)
    builder.register_public_input(initial_a)
    target = _num_dummy_gates(log2_size)
    assert target >= builder.num_gates(), "size too small to support lookups"
    for _ in range(builder.num_gates(), target):
        builder.add_gate(NoopGate(), [])
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial_a, 2)
    proof = data.prove(pw)
    data.verify(proof)
    return proof, data.verifier_only, data.common


def dummy_many_rows_proof(config: CircuitConfig, log2_size: int):
    """2^size-gate proof with 515 lookups on one LUT
    (reference bench_recursion.rs:151-200, --lookup_type 2)."""
    from plonky2_tpu.gadgets.lookup import TIP5_TABLE

    builder = CircuitBuilder(config)
    tip5_idx = builder.add_lookup_table_from_table(list(range(256)), list(TIP5_TABLE))
    initial_a = builder.add_virtual_target()
    output = builder.add_lookup_from_index(initial_a, tip5_idx)
    for _ in range(514):
        builder.add_lookup_from_index(output, 0)
    target = _num_dummy_gates(log2_size)
    assert target >= builder.num_gates(), "size too small to support lookups"
    for _ in range(builder.num_gates(), target):
        builder.add_gate(NoopGate(), [])
    data = builder.build()
    pw = PartialWitness()
    pw.set_target(initial_a, 2)
    proof = data.prove(pw)
    data.verify(proof)
    return proof, data.verifier_only, data.common


_DUMMY_PROOF_FNS = {0: dummy_proof, 1: dummy_lookup_proof, 2: dummy_many_rows_proof}


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


def _phase_dict(timing: TimingTree) -> dict:
    """Top-level phase durations of a prove TimingTree as {name: seconds}
    (the prover's phase scopes are direct children of the tree it is given,
    plonk/prover.py:179-289)."""
    out = {}
    for c in timing.children:
        out[c.name] = round(out.get(c.name, 0.0) + c.duration, 4)
    return out


def run_chain(size: int = 12, config: CircuitConfig | None = None, verbose: bool = True,
              repeats: int = 0, lookup_type: int = 0,
              warm_before_outer: bool = False, on_warm=None, time_left=None,
              batch: int = 0, batch_threads: int = 2):
    """Chain of three proofs: inner 2^size -> middle -> outer.

    lookup_type selects the inner circuit as in the reference CLI
    (bench_recursion.rs:70-74): 0 = noop gates only, 1 = one TIP5 lookup,
    2 = 515 lookups.

    First-build times include one-time costs (circuit construction, XLA
    tracing, compile-cache population). `repeats` re-proves the middle
    recursion circuit in-process afterwards — the steady-state prover
    latency a proving service sees (the reference's criterion bench also
    measures warm in-process iterations).

    Budget hooks (used by bench.py): `warm_before_outer` runs the warm
    repeats immediately after the middle layer (before the outer build),
    `on_warm(best, repeat_idx)` fires after each improving warm repeat, and
    `time_left()` (seconds) lets the warm loop and the outer layer be
    skipped when the wall-clock budget is nearly spent.
    """
    config = config or CircuitConfig.standard_recursion_config()
    timings = {}

    t0 = time.time()
    inner = _DUMMY_PROOF_FNS.get(lookup_type, dummy_proof)(config, size)
    timings["inner"] = time.time() - t0
    if verbose:
        print(f"inner proof (2^{size} gates): {timings['inner']:.1f}s "
              f"degree 2^{inner[2].degree_bits}", flush=True)

    import logging

    debug_timing = logging.getLogger().isEnabledFor(logging.DEBUG)

    t0 = time.time()
    mid_timing = TimingTree("middle recursion prove") if debug_timing else None
    middle, middle_data = recursive_proof(inner, config, return_data=True,
                                          timing=mid_timing)
    timings["middle"] = time.time() - t0
    if debug_timing:
        mid_timing.print(min_seconds=0.01)
    if verbose:
        print(f"middle recursion layer: {timings['middle']:.1f}s "
              f"degree 2^{middle[2].degree_bits}", flush=True)

    def warm_repeats():
        pw = PartialWitness()
        set_proof_with_pis_target(pw, middle_data["pt"], inner[0])
        set_verifier_data_target(pw, middle_data["vdt"], inner[1])
        best = float("inf")
        proof = None
        for r in range(repeats):
            if r > 0 and time_left is not None and time_left() < 60:
                break
            phase_timing = TimingTree("warm prove") if r == repeats - 1 else None
            t0 = time.time()
            proof = middle_data["data"].prove(pw, timing=phase_timing)
            dt = time.time() - t0
            if dt < best:
                best = dt
                if on_warm is not None:
                    on_warm(best, r)
            if phase_timing is not None:
                timings["phases"] = _phase_dict(phase_timing)
            if verbose:
                print(f"warm recursive prove[{r}]: {dt:.2f}s", flush=True)
        middle_data["data"].verify(proof)
        timings["warm_prove"] = best
        if verbose:
            print(f"steady-state recursive prove: {best:.2f}s "
                  f"({1.0/best:.2f} proofs/s)", flush=True)
        if batch:
            # batched/pipelined throughput mode (the reference CLI's
            # --threads sweep analog, bench_recursion.rs:372-393)
            t0 = time.time()
            proofs = middle_data["data"].prove_many(
                [pw] * batch, threads=batch_threads)
            dt = (time.time() - t0) / batch
            middle_data["data"].verify(proofs[-1])
            timings["batched_prove"] = dt
            if verbose:
                print(f"batched throughput (K={batch}, "
                      f"threads={batch_threads}): {dt:.3f}s/proof "
                      f"({1.0/dt:.2f} proofs/s)", flush=True)

    if repeats and warm_before_outer:
        warm_repeats()

    outer = middle
    if time_left is None or time_left() > 90:
        t0 = time.time()
        outer = recursive_proof(middle, config)
        timings["outer"] = time.time() - t0
        if verbose:
            print(f"outer recursion layer: {timings['outer']:.1f}s "
                  f"degree 2^{outer[2].degree_bits}", flush=True)

    if repeats and not warm_before_outer:
        warm_repeats()

    return outer, timings


def main():
    import argparse
    import logging

    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=12, help="log2 of inner gate count")
    p.add_argument("--repeats", type=int, default=0,
                   help="steady-state re-proves of the middle recursion layer")
    p.add_argument("--lookup_type", type=int, default=0,
                   help="0 = noops only, 1 = one lookup, 2 = 515 lookups "
                        "(reference bench_recursion.rs:70-74)")
    p.add_argument("--batch", type=int, default=0,
                   help="also measure batched throughput: prove_many over "
                        "K warm middle-layer witnesses (the reference "
                        "--threads sweep analog)")
    p.add_argument("--batch-threads", type=int, default=2,
                   help="dispatch threads for --batch")
    p.add_argument("-v", "--verbose", action="count", default=1,
                   help="-v info (default), -vv debug timing trees "
                        "(reference bench_recursion.rs:354-364)")
    p.add_argument("-q", "--quiet", action="store_true")
    args = p.parse_args()
    if args.batch and not args.repeats:
        args.repeats = 1  # the batch measurement runs with the warm repeats
    level = (logging.WARNING if args.quiet
             else logging.DEBUG if args.verbose >= 2 else logging.INFO)
    logging.basicConfig(level=level, format="%(levelname).1s %(name)s: %(message)s")
    run_chain(args.size, repeats=args.repeats, lookup_type=args.lookup_type,
              verbose=not args.quiet, batch=args.batch,
              batch_threads=args.batch_threads)
    print("bench_recursion chain verified")


if __name__ == "__main__":
    main()
