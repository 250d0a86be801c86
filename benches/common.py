"""Shared microbench harness (the criterion analog).

Mirrors the reference's bench protocol (plonky2/benches/*.rs): each bench
prints one JSON line per (name, size) with the measured time and derived
throughput. Device benches keep the iteration loop INSIDE jit
(lax.fori_loop, input perturbed per iteration to defeat CSE) and force the
result with a reduced-scalar fetch — under the axon tunnel, per-call host
timing is dominated by the ~28ms transport RTT and block_until_ready is
unreliable.
"""

from __future__ import annotations

import json
import time


def measure_device(pipeline_sum, values, iters: int, *, subtract_rtt: bool = True,
                   calls: int = 2):
    """pipeline_sum: jitted fn running `iters` iterations internally and
    returning a scalar. Returns seconds per iteration (min over `calls`).

    The input is perturbed per call: the axon runtime MEMOIZES repeated
    executions with identical input buffers, which collapses same-input
    repeat timings to ~0 (round-5 finding)."""
    import jax.numpy as jnp

    int(pipeline_sum(values))  # compile + warmup
    best = float("inf")
    for k in range(1, calls + 1):
        v = values + jnp.uint64(k)
        t0 = time.perf_counter()
        int(pipeline_sum(v))
        best = min(best, time.perf_counter() - t0)
    if subtract_rtt:
        import jax

        if jax.default_backend() not in ("cpu",):
            best -= 0.028
    return max(best, 1e-9) / iters


def measure_host(fn, iters: int):
    fn()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def report(name: str, size, seconds: float, unit: str = "elems/s",
           elems: int | None = None, **extra):
    row = {"bench": name, "size": size, "seconds": round(seconds, 6)}
    if elems is not None:
        row["throughput"] = round(elems / seconds, 1)
        row["unit"] = unit
    row.update(extra)
    print(json.dumps(row), flush=True)
    return row
