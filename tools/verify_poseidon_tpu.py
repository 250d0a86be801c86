"""Real-TPU verification of the fused Pallas Poseidon sponge kernel.

Runs the leaf sponge (width 135) on the axon chip, spot-checks digests
against the pure-Python scalar sponge, and times pallas vs the XLA
state-major path (loop inside jit, XOR-forced, one RTT subtracted).

Usage: timeout 580 python tools/verify_poseidon_tpu.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import plonky2_tpu
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.ops import pallas_poseidon as pp


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(5)
    width, lg_n = 135, 16
    n = 1 << lg_n
    leaves = rng.integers(0, fs.P, size=(width, n), dtype=np.uint64)
    L = jnp.asarray(leaves)

    t0 = time.time()
    got = np.asarray(jax.jit(pp.sponge_pallas)(L))
    print("pallas compile+run", round(time.time() - t0, 1), "s")
    for i in (0, 1, 12345, n - 1):
        want = ps.hash_n_to_m_no_pad([int(v) for v in leaves[:, i]], 4)
        assert [int(v) for v in got[:, i]] == want, i
    print("scalar KAT spot checks OK")

    def timed(fn, x, iters=8):
        @jax.jit
        def loop(v):
            def body(i, acc):
                out = fn(v + i.astype(jnp.uint64))
                return acc ^ jnp.bitwise_xor.reduce(jnp.ravel(out))
            return lax.fori_loop(0, iters, body, jnp.uint64(0))

        r = int(loop(x))
        t0 = time.perf_counter()
        assert int(loop(x)) == r
        return (time.perf_counter() - t0 - 0.028) / iters

    def xla_leaves(x):
        from plonky2_tpu.hash.poseidon_constants import SPONGE_RATE, SPONGE_WIDTH

        state = jnp.zeros((SPONGE_WIDTH, x.shape[1]), dtype=jnp.uint64)
        for i in range(0, width, SPONGE_RATE):
            chunk = x[i : i + SPONGE_RATE]
            state = jnp.concatenate([chunk, state[chunk.shape[0]:]], axis=0)
            state = ps.permute_dev_sm(state)
        return state[:4]

    tp = timed(pp.sponge_pallas, L)
    print(f"pallas leaf sponge: {tp*1e3:.1f} ms for 2^{lg_n} leaves of {width}")
    tx = timed(xla_leaves, L)
    print(f"xla   leaf sponge: {tx*1e3:.1f} ms ; speedup {tx/tp:.2f}x")


if __name__ == "__main__":
    main()
