"""Real-TPU drive of the full commit pipeline (iNTT -> coset LDE(x8) ->
natural-order Merkle-cap tree with the fused Pallas Poseidon sponge).

Cross-checks the cap against the host-side scalar golden model and times
the device pipeline ([135, 2^16] wires, rate 8 -> 2^19 leaf hashes).
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

import plonky2_tpu
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.oracle import PolynomialBatch
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.util import reverse_bits


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(7)
    num_polys, lg_n, rate_bits, cap_h = 135, 16, 3, 4
    values = rng.integers(0, fs.P, size=(num_polys, 1 << lg_n), dtype=np.uint64)

    t0 = time.time()
    batch = PolynomialBatch.from_values(values, rate_bits, False, cap_h)
    print("commit compile+run:", round(time.time() - t0, 1), "s")

    # golden-model spot check: leaf 0 and a deep proof verify on host
    from plonky2_tpu.hash.merkle import verify_merkle_proof_to_cap
    for i in (0, 5, (1 << (lg_n + rate_bits)) - 1):
        leaf = batch.merkle_tree.leaf(i)
        proof = batch.merkle_tree.prove(i)
        verify_merkle_proof_to_cap(leaf, i, batch.merkle_tree.cap, proof)
    # leaf data = LDE row rev(i): check leaf 0 col equals scalar sponge input
    digs = ps.hash_n_to_m_no_pad(batch.merkle_tree.leaf(0), 4)
    lvl0 = batch.merkle_tree._layers[0]
    assert [int(v) for v in lvl0[:, 0]] == digs
    print("golden-model checks OK")

    t0 = time.time()
    b2 = PolynomialBatch.from_values(values, rate_bits, False, cap_h)
    np.asarray(b2.merkle_tree._layers[-1])
    print("warm commit pipeline:", round(time.time() - t0, 3), "s (incl host fetches)")


if __name__ == "__main__":
    main()
