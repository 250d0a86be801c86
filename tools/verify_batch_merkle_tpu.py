"""Real-TPU drive of the device-resident BatchMerkleTree path.

Builds a batch tree over matrices of different heights on the axon backend,
extracts all query openings via the new single-gather ``open_batch_many``,
and cross-checks every opening against the per-index host walk
(``values``/``open_batch``) plus full proof verification against the cap.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import plonky2_tpu  # noqa: E402
from plonky2_tpu.hash.merkle import (  # noqa: E402
    BatchMerkleTree,
    verify_batch_merkle_proof_to_cap,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(11)
    heights = [10, 8, 6]
    mats = [
        jnp.asarray(rng.integers(0, (1 << 63), size=(1 << h, w), dtype=np.uint64))
        for h, w in zip(heights, (7, 3, 2))
    ]
    t0 = time.time()
    tree = BatchMerkleTree(mats, cap_height=2)
    print("build:", round(time.time() - t0, 1), "s", flush=True)

    indices = [0, 1, 5, (1 << 10) - 1, 513, 777]
    t0 = time.time()
    opens = tree.open_batch_many(indices)
    print("open_batch_many:", round(time.time() - t0, 1), "s", flush=True)

    for idx, (flat, proof) in zip(indices, opens):
        ref_vals = [v for row in tree.values(idx) for v in row]
        assert flat == ref_vals, f"values mismatch at {idx}"
        ref_proof = tree.open_batch(idx)
        assert proof.siblings == ref_proof.siblings, f"proof mismatch at {idx}"
        verify_batch_merkle_proof_to_cap(
            tree.values(idx), tree.leaf_heights, idx, tree.cap, proof)
    print("OK: all", len(indices), "batched openings match + verify", flush=True)


if __name__ == "__main__":
    main()
