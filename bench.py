"""Driver benchmark: coset NTT/iNTT + LDE throughput at n = 2^20.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no absolute numbers (BASELINE.md) and the Rust
toolchain is absent, so vs_baseline reports this run against the pure-XLA
path of the same pipeline (the pre-Pallas implementation) measured in the
same process — i.e. the speedup contributed by the fused kernels.

The iteration loop runs INSIDE jit (lax.fori_loop, input perturbed per
iteration to defeat CSE) and one reduced scalar is fetched at the end:
device->host fetches cost a ~28ms tunnel round-trip under axon and
block_until_ready is unreliable there, so per-call host timing would be
dominated by transport.
"""

import json
import time

import numpy as np


def _measure(pipeline_sum, values, iters):
    ref = int(pipeline_sum(values))  # compile + warmup
    t0 = time.perf_counter()
    out = int(pipeline_sum(values))
    dt = (time.perf_counter() - t0 - 0.028) / iters  # subtract one fetch RTT
    assert out == ref
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from plonky2_tpu.field import ntt
    from plonky2_tpu.ops import pallas_ntt

    lg_n = 20
    n = 1 << lg_n
    num_polys = 4
    rate_bits = 3
    iters = 8

    rng = np.random.default_rng(0)
    values = jnp.asarray(
        rng.integers(0, (1 << 64) - (1 << 32), size=(num_polys, n), dtype=np.uint64)
    )

    def make(flag):
        pallas_ntt._FLAG = flag

        @jax.jit
        def pipeline_sum(v):
            def body(i, acc):
                out = ntt.coset_lde(ntt.ifft(v + i.astype(jnp.uint64)), rate_bits)
                return acc ^ jnp.bitwise_xor.reduce(jnp.ravel(out))

            return lax.fori_loop(0, iters, body, jnp.uint64(0))

        return pipeline_sum

    flag = pallas_ntt._FLAG
    dt = _measure(make(flag), values, iters)
    elems_per_s = num_polys * n / dt

    vs_baseline = 0.0
    if pallas_ntt.should_use(lg_n // 2, 0):  # only when the kernels are live
        dt_xla = _measure(make("0"), values, iters)
        pallas_ntt._FLAG = flag
        vs_baseline = round(dt_xla / dt, 3)

    print(json.dumps({
        "metric": f"coset iNTT+LDE(x{1 << rate_bits}) throughput, n=2^{lg_n}",
        "value": round(elems_per_s, 1),
        "unit": "goldilocks elems/s/chip",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
