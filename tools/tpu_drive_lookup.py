"""Drive the round-4 lookup fused-transcript path end-to-end on the real TPU
(axon): prove a lookup-bearing circuit, assert it took the fused device
transcript, verify it, byte-compare against the forced host path, and check
a corrupted proof is rejected. Used by the /verify recipe."""

import time

import plonky2_tpu.fri.prover as fp
import plonky2_tpu.plonk.prover as pp
from plonky2_tpu.iop.witness import PartialWitness
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
from plonky2_tpu.plonk.config import CircuitConfig
from plonky2_tpu.plonk.serialization import proof_to_bytes
from plonky2_tpu.util import rng


def main():
    import jax

    print("backend:", jax.default_backend(), jax.devices())
    config = CircuitConfig.standard_recursion_config()
    b = CircuitBuilder(config)
    lut = b.add_lookup_table_from_table(list(range(16)),
                                        [(7 * i + 3) % 16 for i in range(16)])
    x = b.add_virtual_target()
    out = b.add_lookup_from_index(x, lut)
    b.register_public_input(out)
    cur = out
    for i in range(700):
        cur = b.mul(cur, b.constant(i % 13 + 1))
    b.register_public_input(cur)
    t0 = time.time()
    data = b.build()
    print(f"built degree 2^{data.common.degree_bits} in {time.time()-t0:.1f}s")

    def run():
        pw = PartialWitness()
        pw.set_target(x, 5)
        rng.seed(77)
        proof = data.prove(pw)
        rng.seed(None)
        data.verify(proof)
        return proof

    t0 = time.time()
    proof_fused = run()
    print(f"fused prove+verify: {time.time()-t0:.1f}s "
          f"transcript={pp._LAST_TRANSCRIPT} fri={fp._LAST_PATH}")
    assert pp._LAST_TRANSCRIPT == "fused", pp._LAST_TRANSCRIPT
    assert fp._LAST_PATH == "fused", fp._LAST_PATH
    t0 = time.time()
    proof_fused2 = run()
    print(f"warm fused prove+verify: {time.time()-t0:.1f}s")

    with fp.force_host_path():
        proof_host = run()
    assert pp._LAST_TRANSCRIPT == "host"
    assert proof_to_bytes(proof_fused) == proof_to_bytes(proof_host), \
        "fused/host proof bytes diverge"
    assert proof_to_bytes(proof_fused) == proof_to_bytes(proof_fused2)

    # corrupted proof must fail
    bad = run()
    bad.public_inputs[0] ^= 1
    try:
        data.verify(bad)
    except Exception as e:
        print("corrupted proof rejected:", type(e).__name__)
    else:
        raise AssertionError("corrupted proof verified!")
    print("TPU DRIVE OK")


if __name__ == "__main__":
    main()
