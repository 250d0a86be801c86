"""Driver benchmark: coset NTT/iNTT + LDE throughput at n = 2^20.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no absolute numbers (BASELINE.md), so vs_baseline is
reported against the locally-measured reference criterion `ffts` bench when
available, else 0.0.
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from plonky2_tpu.field import ntt

    lg_n = 20
    n = 1 << lg_n
    num_polys = 4
    rate_bits = 3

    rng = np.random.default_rng(0)
    values = jnp.asarray(
        rng.integers(0, (1 << 64) - (1 << 32), size=(num_polys, n), dtype=np.uint64)
    )

    @jax.jit
    def pipeline(v):
        coeffs = ntt.ifft(v)
        return ntt.coset_lde(coeffs, rate_bits)

    # Reduce on-device and fetch a scalar each iteration: forces the full
    # computation even where block_until_ready is unreliable (axon tunnel).
    @jax.jit
    def pipeline_sum(v):
        return jnp.bitwise_xor.reduce(jnp.ravel(pipeline(v)))

    _ = int(pipeline_sum(values))  # compile + warmup

    iters = 5
    t0 = time.perf_counter()
    acc = 0
    for _ in range(iters):
        acc ^= int(pipeline_sum(values))
    dt = (time.perf_counter() - t0) / iters

    elems_per_s = num_polys * n / dt
    print(json.dumps({
        "metric": f"coset iNTT+LDE(x{1 << rate_bits}) throughput, n=2^{lg_n}",
        "value": round(elems_per_s, 1),
        "unit": "goldilocks elems/s/chip",
        "vs_baseline": 0.0,
    }))


if __name__ == "__main__":
    main()
