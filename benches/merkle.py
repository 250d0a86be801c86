"""Merkle-tree build microbench (reference plonky2/benches/merkle.rs:
tree over 135-felt leaves, cap_height 4).
"""

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

from benches.common import measure_host, report


def main(lg_n=13, width=135, cap_height=4):
    import jax.numpy as jnp

    import plonky2_tpu  # noqa: F401
    from plonky2_tpu.hash.merkle import NaturalMerkleTree

    n = 1 << lg_n
    rng = np.random.default_rng(0)
    cols = jnp.asarray(
        rng.integers(0, (1 << 64) - (1 << 32), size=(width, n), dtype=np.uint64))

    k = [0]

    def build():
        # perturb per call: the axon runtime memoizes identical executions
        k[0] += 1
        t = NaturalMerkleTree(cols + jnp.uint64(k[0]), cap_height)
        return t.cap  # forces the device computation + cap fetch

    dt = measure_host(build, 3)
    report("merkle_tree_build[135/leaf]", f"2^{lg_n} leaves", dt,
           unit="leaves/s", elems=n)


if __name__ == "__main__":
    main()
