"""FFT / LDE microbench (reference plonky2/benches/ffts.rs: 2^13..2^16).

Per size: forward fft and rate-8 coset LDE, one JSON line each.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from benches.common import measure_device, report


def main(sizes=(13, 14, 15, 16), iters=8):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import plonky2_tpu  # noqa: F401
    from plonky2_tpu.field import ntt

    rng = np.random.default_rng(0)
    for lg_n in sizes:
        n = 1 << lg_n
        # scale iterations so per-call device work dwarfs the ~25 ms tunnel
        # RTT even at the small criterion sizes (total >= ~2^24 elems)
        it = max(iters, 1 << max(0, 24 - lg_n))
        values = jnp.asarray(
            rng.integers(0, (1 << 64) - (1 << 32), size=(n,), dtype=np.uint64))

        for name, f in (("fft", ntt.fft),
                        ("coset_lde_x8", lambda c: ntt.coset_lde(c, 3))):
            @jax.jit
            def loop(v, f=f, it=it):
                def body(i, acc):
                    out = f(v + i.astype(jnp.uint64))
                    return acc ^ jnp.bitwise_xor.reduce(jnp.ravel(out))
                return lax.fori_loop(0, it, body, jnp.uint64(0))

            dt = measure_device(loop, values, it)
            report(name, f"2^{lg_n}", dt, elems=n, iters=it)


if __name__ == "__main__":
    main()
