"""Field-arithmetic microbench (reference plonky2/benches/field_arithmetic.rs).

Device u64-lane mul/add and batch inverse, plus host native vector ops.
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from benches.common import measure_device, measure_host, report


def main(lg_n=20, iters=16):
    import jax
    import jax.numpy as jnp
    from jax import lax

    import plonky2_tpu  # noqa: F401
    from plonky2_tpu.field import goldilocks as g

    n = 1 << lg_n
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, (1 << 64) - (1 << 32), size=(n,), dtype=np.uint64))

    for name, f in (("mul[device]", lambda v: g.mul(v, v)),
                    ("add[device]", lambda v: g.add(v, v)),
                    ("inverse[device]", g.inverse)):
        @jax.jit
        def loop(v, f=f):
            def body(i, acc):
                out = f(v + i.astype(jnp.uint64))
                return acc ^ jnp.bitwise_xor.reduce(jnp.ravel(out))
            return lax.fori_loop(0, iters, body, jnp.uint64(0))

        dt = measure_device(loop, x, iters)
        report(name, f"2^{lg_n}", dt, elems=n)

    from plonky2_tpu import native

    if native.available:
        hx = rng.integers(1, (1 << 63), size=n, dtype=np.uint64)
        for name, f in (("mul[native-host]", lambda: native.mul(hx, hx)),
                        ("batch_inverse[native-host]", lambda: native.batch_inverse(hx))):
            dt = measure_host(f, 3)
            report(name, f"2^{lg_n}", dt, elems=n)


if __name__ == "__main__":
    main()
