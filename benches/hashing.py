"""Hashing microbench (reference plonky2/benches/hashing.rs).

Poseidon-12 permutation (device batch + host scalar/native) and keccak
2-to-1 compression, one JSON line each.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from benches.common import measure_device, measure_host, report


def main(lg_batch=14, iters=8):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import plonky2_tpu  # noqa: F401
    from plonky2_tpu.hash import poseidon as ps

    n = 1 << lg_batch
    rng = np.random.default_rng(0)
    states = jnp.asarray(
        rng.integers(0, (1 << 64) - (1 << 32), size=(12, n), dtype=np.uint64))

    @jax.jit
    def loop(st):
        def body(i, acc):
            out = ps.permute_dev_sm(st + i.astype(jnp.uint64))
            return acc ^ jnp.bitwise_xor.reduce(jnp.ravel(out))
        return lax.fori_loop(0, iters, body, jnp.uint64(0))

    dt = measure_device(loop, states, iters)
    report("poseidon_permute[device]", f"2^{lg_batch} states", dt, unit="perms/s", elems=n)

    # host scalar permutation (the challenger's duplex path; native C++ if built)
    st = [int(v) for v in rng.integers(0, (1 << 64) - (1 << 32), size=12, dtype=np.uint64)]
    dt = measure_host(lambda: ps.permute(st), 200)
    report("poseidon_permute[host]", "1 state", dt, unit="perms/s", elems=1)

    # keccak 2-to-1 compression (numpy/native batch)
    from plonky2_tpu.hash import keccak as kk

    data = rng.integers(0, 256, size=(n, 64), dtype=np.uint8)
    dt = measure_host(lambda: kk.keccak256_batch(data), 5)
    report("keccak256_2to1[host]", f"2^{lg_batch} pairs", dt, unit="hashes/s", elems=n)


if __name__ == "__main__":
    main()
