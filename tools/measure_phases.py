"""Per-phase DEVICE time of the fused prove chain on the real chip: run the
same call sequence as plonk.prover._prove_fused but block_until_ready after
each phase (min over repeats; tunnel RTT ~28ms rides every sync, so small
phases read as ~RTT). Usage: python tools/measure_phases.py [repeats]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from measure_throughput import load_middle  # noqa: E402


def main():
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    import jax
    import jax.numpy as jnp
    import numpy as np

    from plonky2_tpu.fri.prover import _fri_proof_fused
    from plonky2_tpu.iop.challenger import Challenger, cap_boundary_fn
    from plonky2_tpu.iop.generator import generate_partial_witness
    from plonky2_tpu.fri.oracle import PolynomialBatch
    from plonky2_tpu.plonk import config as pcfg
    from plonky2_tpu.plonk import prover as P
    from plonky2_tpu.util import TimingTree

    data, pw = load_middle()
    prover_data, common = data.prover_only, data.common
    config = common.config
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height
    nc = config.num_challenges

    # warm everything once
    t0 = time.time()
    data.prove(pw)
    print(f"first prove: {time.time()-t0:.1f}s", flush=True)

    gc = common.generic_config()
    hasher = gc.hasher
    phases = {}

    def mark(name, t0, *arrays):
        for a in arrays:
            jax.block_until_ready(a)
        dt = time.time() - t0
        phases[name] = min(phases.get(name, 1e9), dt)
        return time.time()

    for rep in range(repeats):
        partition_witness = generate_partial_witness(pw, prover_data, common)
        public_inputs = partition_witness.get_targets(prover_data.public_inputs)
        public_inputs_hash = gc.inner_hasher.hash_no_pad(public_inputs)
        witness = partition_witness.full_witness()

        t = time.time()
        wires_commitment = PolynomialBatch.from_values(
            witness, rate_bits, False, cap_height, hasher=hasher)
        t = mark("wires commit (ifft+LDE+merkle)", t,
                 wires_commitment.lde, *wires_commitment.merkle_tree._layers_dev)

        challenger = Challenger(hasher)
        common.fri_params.observe(challenger)
        challenger.observe_hash(prover_data.circuit_digest)
        challenger.observe_hash(public_inputs_hash)
        from plonky2_tpu.parallel import replicate

        k0 = len(challenger.input_buffer)
        sponge = replicate(jnp.asarray(
            np.asarray(challenger.sponge_state, dtype=np.uint64)))
        pend = replicate(jnp.asarray(
            np.asarray(challenger.input_buffer, dtype=np.uint64)))
        no_pend = replicate(jnp.zeros((0,), dtype=jnp.uint64))

        t = time.time()
        b1 = cap_boundary_fn(k0, cap_height, True, 2 * nc)
        sponge1, _, draws1, cap_w = b1(
            sponge, pend, replicate(wires_commitment.merkle_tree.cap_dev))
        t = mark("boundary1", t, sponge1, draws1)
        betas, gammas = draws1[:nc], draws1[nc:2 * nc]

        t = time.time()
        wires_values_routed = jnp.asarray(witness[: config.num_routed_wires])
        zs_partial_products = P._all_partial_products_and_zs(
            wires_values_routed, prover_data, common, betas, gammas)
        t = mark("round2 scans", t, zs_partial_products)

        t = time.time()
        zs_pp_commitment = PolynomialBatch.from_values(
            zs_partial_products, rate_bits, False, cap_height, hasher=hasher)
        t = mark("zs_pp commit", t, zs_pp_commitment.lde,
                 *zs_pp_commitment.merkle_tree._layers_dev)

        t = time.time()
        b2 = cap_boundary_fn(0, cap_height, True, nc)
        sponge2, _, alphas, cap_z = b2(
            sponge1, no_pend, replicate(zs_pp_commitment.merkle_tree.cap_dev))
        t = mark("boundary2", t, sponge2, alphas)

        t = time.time()
        quotient_chunks = P._compute_quotient_polys(
            prover_data, common, prover_data.constants_sigmas_commitment,
            wires_commitment, zs_pp_commitment,
            public_inputs_hash, betas, gammas, alphas)
        t = mark("quotient eval+ifft", t, quotient_chunks)

        t = time.time()
        quot_commitment = PolynomialBatch.from_coeffs(
            quotient_chunks, rate_bits, False, cap_height, hasher=hasher)
        t = mark("quotient commit", t, quot_commitment.lde,
                 *quot_commitment.merkle_tree._layers_dev)

        t = time.time()
        b3 = cap_boundary_fn(0, cap_height, True, 2)
        sponge3, _, zdraw, cap_q = b3(
            sponge2, no_pend, replicate(quot_commitment.merkle_tree.cap_dev))
        t = mark("boundary3", t, sponge3, zdraw)

        n_cs = int(prover_data.constants_sigmas_commitment.polynomials.shape[0])
        n_w = int(wires_commitment.polynomials.shape[0])
        n_z = int(zs_pp_commitment.polynomials.shape[0])
        n_q = int(quot_commitment.polynomials.shape[0])
        n_zpp = common.num_zs_partial_products_polys()
        t = time.time()
        fn = P._openings_final_fn(n_cs, n_w, n_z, n_q, nc, common.degree_bits,
                                  rate_bits, n_zpp)
        packed, zz, f0, f1, sponge4 = fn(
            sponge3, zdraw,
            prover_data.constants_sigmas_commitment.polynomials,
            wires_commitment.polynomials,
            zs_pp_commitment.polynomials,
            quot_commitment.polynomials)
        t = mark("openings+final", t, packed, f0, f1, sponge4)

        total = n_cs + n_w + 2 * n_z + n_q
        extra = jnp.concatenate([
            jnp.ravel(cap_w), jnp.ravel(cap_z), jnp.ravel(cap_q),
            jnp.ravel(packed), zz])
        t = time.time()
        tt = TimingTree("fri")
        opening_proof, extra_host = _fri_proof_fused(
            [prover_data.constants_sigmas_commitment.merkle_tree,
             wires_commitment.merkle_tree,
             zs_pp_commitment.merkle_tree,
             quot_commitment.merkle_tree],
            (f0, f1), None, common.fri_params,
            device_state=(sponge4, []), extra_payload=extra, timing=tt)
        t = mark("fri fused commit+pow+gather+fetch", t)
        if rep == repeats - 1:
            tt.print(min_seconds=0.001)

    print(json.dumps({k: round(v, 4) for k, v in phases.items()}, indent=1))
    print("sum:", round(sum(phases.values()), 4))


if __name__ == "__main__":
    main()
