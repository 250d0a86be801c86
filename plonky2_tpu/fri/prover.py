"""FRI prover: commit-phase folding, PoW grind, query rounds.

Reference: fri/prover.rs:24-258. Device/host split: folding, re-FFTs, Merkle
builds and the PoW scan are jitted device programs; the challenger transcript
(one cap + beta per fold step) is host-side — the same log-depth sync structure
as the reference's sequential fold loop.

Coefficient arrays are kept TRIMMED to their nonzero prefix (the reference
carries the zero tail and truncates at the end, fri/prover.rs:139-141); folding
the zero tail yields zeros, so the results are identical and every re-FFT gets
the zero-tail LDE fast path.
"""

from __future__ import annotations

import contextlib
import functools
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.util.export_cache import persistent_jit
from plonky2_tpu.field import ntt
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.proof import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
)
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.hash.merkle import MerkleTree, make_merkle_tree


# Test hooks (tests/test_fri_path_matrix.py): _FORCE_HOST disables every
# fused path (all configs then take the host transcript); _LAST_PATH records
# which FRI code path the most recent proof executed — "fused" (whole FRI
# argument in one fetch), "commit_fused" (fused commit phase, host PoW and
# query rounds), or "host". Tests should set the flag via force_host_path()
# so it is always restored.
_FORCE_HOST = False
_LAST_PATH = None


@contextlib.contextmanager
def force_host_path():
    """Test-only scope: force proves onto the host transcript path, restoring
    the previous flag value on exit (exceptions included)."""
    global _FORCE_HOST
    prev = _FORCE_HOST
    _FORCE_HOST = True
    try:
        yield
    finally:
        _FORCE_HOST = prev


def fri_proof(initial_merkle_trees, final_coeffs, challenger, fri_params,
              final_poly_coeff_len=None, max_num_query_steps=None,
              hasher=None) -> FriProof:
    """final_coeffs: ext coeff arrays (c0, c1), length 2^degree_bits (trimmed)."""
    from plonky2_tpu.hash.hashers import PoseidonHasher

    n = fri_params.lde_size
    algebraic = (hasher is None or hasher is PoseidonHasher
                 or getattr(hasher, "algebraic", False))
    arities = tuple(fri_params.reduction_arity_bits)
    if (not _FORCE_HOST
            and algebraic and arities and challenger.hasher is PoseidonHasher
            and final_poly_coeff_len is None and max_num_query_steps is None
            and all(hasattr(t, "_layers_dev") for t in initial_merkle_trees)):
        # Fully fused path: commit folds + final-poly observation + PoW grind
        # + query-index draws run in ONE device program; query gathers are
        # driven by the device-resident indices — the whole FRI argument is
        # async dispatches + a single device->host fetch.
        return _fri_proof_fused(initial_merkle_trees, final_coeffs,
                                challenger, fri_params)[0]

    trees, final_poly = _fri_committed_trees(
        final_coeffs, challenger, fri_params, final_poly_coeff_len, max_num_query_steps,
        hasher=hasher,
    )

    pow_witness = fri_proof_of_work(challenger, fri_params.config)

    query_round_proofs = _fri_prover_query_rounds(
        initial_merkle_trees, trees, challenger, n, fri_params
    )

    return FriProof(
        commit_phase_merkle_caps=[t.cap for t in trees],
        query_round_proofs=query_round_proofs,
        final_poly=final_poly,
        pow_witness=pow_witness,
    )


def _fold_step_leaves_impl(values, arity_bits, lg_len):
    """Bit-reverse values, chunk into arity cosets, flatten ext -> leaves."""
    v0, v1 = values
    arity = 1 << arity_bits
    perm = jnp.asarray(ntt.bit_reverse_perm(lg_len))
    v0 = jnp.take(v0, perm)
    v1 = jnp.take(v1, perm)
    L = v0.shape[0]
    # leaf row = [e0.0, e0.1, e1.0, e1.1, ...] (flatten of ext elements)
    return jnp.stack([v0, v1], axis=-1).reshape(L // arity, 2 * arity)


_fold_step_leaves = persistent_jit(_fold_step_leaves_impl, static_argnums=(1, 2))


def _fold_coeffs_and_relde_impl(coeffs, beta, arity_bits, rate_bits_shift):
    """Fold coeffs by beta per arity chunk; re-LDE on the next coset.

    rate_bits_shift = (rate_bits, next_shift) both static Python values.
    """
    rate_bits, shift = rate_bits_shift
    c0, c1 = coeffs
    arity = 1 << arity_bits
    m = c0.shape[0] // arity
    c0 = c0.reshape(m, arity)
    c1 = c1.reshape(m, arity)
    acc = (c0[:, arity - 1], c1[:, arity - 1])
    b = (beta[0], beta[1])
    for j in range(arity - 2, -1, -1):
        acc = g.ext2_add(g.ext2_mul(acc, b), (c0[:, j], c1[:, j]))
    new_coeffs = acc
    v0 = ntt.lde_fft(new_coeffs[0], rate_bits, shift=shift)
    v1 = ntt.lde_fft(new_coeffs[1], rate_bits, shift=shift)
    return new_coeffs, (v0, v1)


_fold_coeffs_and_relde = persistent_jit(_fold_coeffs_and_relde_impl,
                                        static_argnums=(2, 3))


@functools.lru_cache(maxsize=None)
def _fused_commit_fn(lg_n, arities, rate_bits, shifts, cap_height, k_pending):
    """One jit program for the ENTIRE commit phase: initial LDE, then per
    fold step (leaf cosets -> Merkle layers -> cap observe -> beta -> fold ->
    re-LDE) with the Fiat-Shamir challenger device-resident
    (iop.challenger.DeviceChallenger). The host path paid one cap fetch +
    one beta round trip per step over the axon tunnel; here the whole chain
    is one dispatch and the caps/final-poly/sponge return in ONE packed
    fetch."""
    from plonky2_tpu.hash.merkle import merkle_layers_dev
    from plonky2_tpu.iop.challenger import DeviceChallenger

    def f(c0, c1, sponge, pending):
        dc = DeviceChallenger(sponge, [pending[i] for i in range(k_pending)])
        shift0 = fs.MULTIPLICATIVE_GROUP_GENERATOR
        values = (ntt.lde_fft(c0, rate_bits, shift=shift0),
                  ntt.lde_fft(c1, rate_bits, shift=shift0))
        coeffs = (c0, c1)
        step_arrays = []
        caps = []
        lg_len = lg_n + rate_bits
        for i, ab in enumerate(arities):
            leaves = _fold_step_leaves_impl(values, ab, lg_len)
            layers = merkle_layers_dev(leaves, cap_height)
            caps.append(layers[-1])
            dc.observe_cap_rows(layers[-1])
            b0 = dc.get_challenge()
            b1 = dc.get_challenge()
            coeffs, values = _fold_coeffs_and_relde_impl(
                coeffs, (b0, b1), ab, (rate_bits, shifts[i]))
            lg_len -= ab
            step_arrays.append((leaves, tuple(layers)))
        packed = jnp.concatenate(
            [jnp.ravel(c) for c in caps] + [coeffs[0], coeffs[1], dc.state])
        return step_arrays, packed

    pj = persistent_jit(f, name="fri.prover.fused_commit")
    key = repr((lg_n, arities, rate_bits, shifts, cap_height, k_pending))
    return lambda *a: pj(*a, _pj_key=key)


def _grind_candidates(intermediate, witness_pos: int, start, pow_bits: int):
    """Check candidates [start, start+CHUNK) for pow_bits leading zeros in
    the duplexed response; returns (found u64, first candidate u64)."""
    cand = start + jax.lax.broadcasted_iota(jnp.uint64, (_GRIND_CHUNK, 1), 0)[:, 0]
    states = jnp.broadcast_to(intermediate, (_GRIND_CHUNK, 12))
    states = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (_GRIND_CHUNK, 12), 1) == witness_pos,
        cand[:, None],
        states,
    )
    out = ps.permute_dev_sm(jnp.swapaxes(states, 0, 1))
    resp = out[7]  # challenger pops state[RATE-1] first
    threshold = np.uint64(1) << np.uint64(64 - pow_bits)
    ok = resp < threshold
    return jnp.any(ok).astype(jnp.uint64), cand[jnp.argmax(ok)]


@functools.lru_cache(maxsize=None)
def _fused_commit_pow_fn(lg_n, arities, rate_bits, shifts, cap_height,
                         k_pending, pow_bits, num_queries):
    """One jit program for the ENTIRE FRI transcript after openings: initial
    LDE, every fold step (leaves -> Merkle -> cap observe -> beta -> fold ->
    re-LDE), final-poly observation, the PoW grind (device while_loop over
    candidate chunks — deterministic: lowest valid witness, same as the
    host chunk scan), the PoW response draw, and the query-index draws.
    Returns (step arrays, packed host payload, device query indices)."""
    from plonky2_tpu.hash.merkle import merkle_layers_dev
    from plonky2_tpu.iop.challenger import DeviceChallenger

    n_final = 1 << (lg_n - sum(arities))
    n_lde = 1 << (lg_n + rate_bits)

    def f(c0, c1, sponge, pending):
        dc = DeviceChallenger(sponge, [pending[i] for i in range(k_pending)])
        shift0 = fs.MULTIPLICATIVE_GROUP_GENERATOR
        values = (ntt.lde_fft(c0, rate_bits, shift=shift0),
                  ntt.lde_fft(c1, rate_bits, shift=shift0))
        coeffs = (c0, c1)
        step_arrays = []
        caps = []
        lg_len = lg_n + rate_bits
        for i, ab in enumerate(arities):
            leaves = _fold_step_leaves_impl(values, ab, lg_len)
            layers = merkle_layers_dev(leaves, cap_height)
            caps.append(layers[-1])
            dc.observe_cap_rows(layers[-1])
            b0 = dc.get_challenge()
            b1 = dc.get_challenge()
            coeffs, values = _fold_coeffs_and_relde_impl(
                coeffs, (b0, b1), ab, (rate_bits, shifts[i]))
            lg_len -= ab
            step_arrays.append((leaves, tuple(layers)))

        # observe the final polynomial's extension coefficients
        for i in range(n_final):
            dc.observe_element(coeffs[0][i])
            dc.observe_element(coeffs[1][i])

        # PoW grind: while_loop over candidate chunks (fri/prover.rs:152-202)
        k = len(dc.inputs)
        inter = (jnp.concatenate([jnp.stack(dc.inputs), dc.state[k:]])
                 if dc.inputs else dc.state)

        def cond(carry):
            return carry[1] == 0

        def body(carry):
            start, _, _ = carry
            found, wit = _grind_candidates(inter, k, start, pow_bits)
            return (start + jnp.uint64(_GRIND_CHUNK), found, wit)

        _, _, witness = jax.lax.while_loop(
            cond, body, (jnp.uint64(0), jnp.uint64(0), jnp.uint64(0)))
        dc.observe_element(witness)
        pow_response = dc.get_challenge()

        idxs = jnp.stack([dc.get_challenge() for _ in range(num_queries)])
        idxs = idxs & jnp.uint64(n_lde - 1)  # n_lde is a power of two

        packed = jnp.concatenate(
            [jnp.ravel(c) for c in caps]
            + [coeffs[0][:n_final], coeffs[1][:n_final],
               witness[None], pow_response[None], idxs, dc.state])
        return step_arrays, packed, idxs

    pj = persistent_jit(f, name="fri.prover.fused_commit_pow")
    key = repr((lg_n, arities, rate_bits, shifts, cap_height, k_pending,
                pow_bits, num_queries))
    return lambda *a: pj(*a, _pj_key=key)


def _sim_remaining_outputs(k_pending, arities, cap_rows, n_final, num_queries):
    """Duplex-schedule count simulation: how many squeezed outputs remain in
    the challenger's output buffer after the fused FRI transcript (values
    don't matter, only the observe/draw sequence)."""
    from plonky2_tpu.hash.poseidon_constants import SPONGE_RATE

    state = {"inp": k_pending, "out": 0}

    def observe(times):
        for _ in range(times):
            state["out"] = 0
            state["inp"] += 1
            if state["inp"] == SPONGE_RATE:
                state["inp"] = 0
                state["out"] = SPONGE_RATE
    def get(times=1):
        for _ in range(times):
            if state["inp"] or not state["out"]:
                state["inp"] = 0
                state["out"] = SPONGE_RATE
            state["out"] -= 1

    for _ in arities:
        observe(cap_rows * 4)
        get(2)
    observe(2 * n_final)
    observe(1)          # pow witness
    get(1)              # pow response
    get(num_queries)    # query indices
    return state["out"]


@functools.lru_cache(maxsize=None)
def _gather_all_fn(descs):
    """ONE jit gathering query openings from every tree and packing them with
    the fused-commit payload into a single flat array (one dispatch + one
    fetch for the whole FRI). descs: per-tree ('rows', shift_bits, levels)
    or ('cols', lg_n, shift_bits, levels)."""
    from plonky2_tpu.hash.merkle import _rev_bits_dev

    def f(idx, packed, extra, *arrays):
        pos = 0
        outs = [extra, packed]
        for d in descs:
            if d[0] == "rows":
                _, shift_bits, levels = d
                leaves = arrays[pos]
                layers = arrays[pos + 1:pos + 1 + levels]
                pos += 1 + levels
                i = (idx >> np.uint64(shift_bits)).astype(jnp.int32)
                lv = jnp.take(leaves, i, axis=0)
                sb = [jnp.take(layer, (i >> k) ^ 1, axis=0)
                      for k, layer in enumerate(layers)]
            else:
                _, lg_n, shift_bits, levels = d
                cols = arrays[pos]
                layers = arrays[pos + 1:pos + 1 + levels]
                pos += 1 + levels
                i = (idx >> np.uint64(shift_bits)).astype(jnp.int32)
                lv = jnp.take(cols, _rev_bits_dev(i, lg_n), axis=1).T
                sb = [jnp.take(layer, _rev_bits_dev((i >> k) ^ 1, lg_n - k),
                               axis=1).T
                      for k, layer in enumerate(layers)]
            outs.append(jnp.ravel(lv).astype(jnp.uint64))
            outs.append(jnp.ravel(jnp.stack(sb, axis=1))
                        if sb else jnp.zeros((0,), jnp.uint64))
        return jnp.concatenate(outs)

    pj = persistent_jit(f, name="fri.prover.gather_all")
    key = repr(descs)
    return lambda *a: pj(*a, _pj_key=key)


def _fri_proof_fused(initial_trees, coeffs, challenger, fri_params,
                     device_state=None, extra_payload=None, timing=None,
                     defer=False):
    global _LAST_PATH
    _LAST_PATH = "fused"
    return _fri_proof_fused_impl(initial_trees, coeffs, challenger, fri_params,
                                 device_state, extra_payload, timing, defer)


class _NullScope:
    def scope(self, name):
        return self

    def __enter__(self):
        return self

    def __exit__(self, *a):
        return False


def _fri_proof_fused_impl(initial_trees, coeffs, challenger, fri_params,
                          device_state=None, extra_payload=None, timing=None,
                          defer=False):
    """Returns (FriProof, extra_host) where extra_host is the fetched
    `extra_payload` prefix (None when no payload was given).

    device_state=(sponge [12] device, pending list of 0-d device scalars)
    continues a DEVICE-resident transcript (the fully-fused prove path in
    plonk/prover.py) instead of loading the host challenger's state;
    `challenger` may then be None and no host state is synced back.
    extra_payload: flat u64 device array prepended to the single fetch —
    the prove-level payload (caps, openings, zeta) rides the FRI transfer.

    defer=True (pipelined throughput proving, plonk/prover.py prove_many):
    returns a zero-argument `finish()` closure instead of fetching — all
    device work is dispatched, and the single device->host transfer + host
    parse run when finish() is called, so the device can start the NEXT
    proof's chain while this proof's payload is still in flight."""
    from plonky2_tpu.hash.merkle import (
        MerkleTree,
        MerkleProof,
        NaturalMerkleTree,
        _gather_openings_cols_ref,
        _gather_openings_rows_ref,
    )
    from plonky2_tpu.parallel import active_mesh, replicate

    timing = timing or _NullScope()
    config = fri_params.config
    rate_bits = config.rate_bits
    cap_height = config.cap_height
    arities = tuple(fri_params.reduction_arity_bits)
    lg_n = coeffs[0].shape[0].bit_length() - 1
    n_final = 1 << (lg_n - sum(arities))
    num_queries = config.num_query_rounds
    rows = 1 << cap_height

    shift = fs.MULTIPLICATIVE_GROUP_GENERATOR
    shifts = []
    for ab in arities:
        shift = fs.exp(shift, 1 << ab)
        shifts.append(shift)

    if device_state is not None:
        sponge, pend_list = device_state
        k_pending = len(pend_list)
        pend = (jnp.stack(pend_list) if pend_list
                else jnp.zeros((0,), dtype=jnp.uint64))
    else:
        pending = challenger.input_buffer
        k_pending = len(pending)
        sponge = jnp.asarray(np.asarray(challenger.sponge_state, dtype=np.uint64))
        pend = jnp.asarray(np.asarray(pending, dtype=np.uint64))
    with timing.scope("dispatch commit+pow+query program"):
        fn = _fused_commit_pow_fn(lg_n, arities, rate_bits, tuple(shifts),
                                  cap_height, k_pending,
                                  config.proof_of_work_bits, num_queries)
        step_arrays, packed, idx_dev = fn(replicate(coeffs[0]),
                                          replicate(coeffs[1]),
                                          replicate(sponge), replicate(pend))

    # Query gathers driven by the DEVICE indices. Fast path (single uniform
    # placement, the normal single-chip prove): ONE jit gathers every tree's
    # openings and packs them with the commit payload — the whole FRI is two
    # dispatches and a single device->host transfer. Under a mesh (or mixed
    # placements — the constants/sigmas oracle is committed at circuit
    # build, outside the mesh) fall back to per-tree gathers with per-tree
    # placed index copies so no program mixes incompatible devices.
    trees_desc = []   # static structure for the combined program
    tree_arrays = []  # (main, layers) per tree, same order
    q = num_queries
    shapes = []       # (q, width, levels) per tree for parsing
    for tree in initial_trees:
        layers = tuple(tree._layers_dev[:-1])
        if isinstance(tree, NaturalMerkleTree):
            trees_desc.append(("cols", tree._lg_n, 0, len(layers)))
            tree_arrays.append((tree._cols_dev, layers))
            shapes.append((q, int(tree._cols_dev.shape[0]), len(layers)))
        else:
            trees_desc.append(("rows", 0, len(layers)))
            tree_arrays.append((tree.leaves, layers))
            shapes.append((q, int(tree.leaves.shape[1]), len(layers)))
    shift_bits = 0
    for i, (leaves, layers) in enumerate(step_arrays):
        shift_bits += arities[i]
        trees_desc.append(("rows", shift_bits, len(layers) - 1))
        tree_arrays.append((leaves, tuple(layers[:-1])))
        shapes.append((q, int(leaves.shape[1]), len(layers) - 1))

    extra = (extra_payload if extra_payload is not None
             else jnp.zeros((0,), dtype=jnp.uint64))
    n_extra = int(extra.shape[0])
    placements = {getattr(a, "sharding", None)
                  for main, layers in tree_arrays
                  for a in (main,) + layers}
    if active_mesh() is None and len(placements) == 1:
        with timing.scope("dispatch gather program"):
            fn2 = _gather_all_fn(tuple(trees_desc))
            out_dev = fn2(
                idx_dev, packed, extra,
                *[a for main, layers in tree_arrays for a in (main,) + layers])
    else:
        def idx_for(arr):
            sh = getattr(arr, "sharding", None)
            if isinstance(sh, jax.sharding.SingleDeviceSharding):
                return jax.device_put(idx_dev, next(iter(arr.devices())))
            return idx_dev

        gathers = []
        for desc, (main, layers) in zip(trees_desc, tree_arrays):
            if desc[0] == "cols":
                lv, sb = _gather_openings_cols_ref(
                    main, layers, idx_for(main), (desc[1], desc[2]))
            else:
                lv, sb = _gather_openings_rows_ref(
                    main, layers, idx_for(main), desc[1])
            gathers.append((replicate(lv), replicate(sb)))
        out_dev = _pack_flat(
            tuple([replicate(extra), replicate(packed)]
                  + [x for g_ in gathers for x in g_]))

    if defer:
        return lambda: _fri_fused_finish(
            out_dev, initial_trees, challenger, fri_params, device_state,
            extra_payload, timing, n_extra, arities, rows, n_final,
            num_queries, k_pending, shapes)
    return _fri_fused_finish(
        out_dev, initial_trees, challenger, fri_params, device_state,
        extra_payload, timing, n_extra, arities, rows, n_final, num_queries,
        k_pending, shapes)


def _fri_fused_finish(out_dev, initial_trees, challenger, fri_params,
                      device_state, extra_payload, timing, n_extra, arities,
                      rows, n_final, num_queries, k_pending, shapes):
    """The single device->host transfer + host parse of the fused FRI chain
    (split out of _fri_proof_fused_impl so prove_many can defer it)."""
    from plonky2_tpu.hash.merkle import MerkleProof

    timing = timing or _NullScope()
    config = fri_params.config
    with timing.scope("block on device + fetch"):
        flat = np.asarray(out_dev)

    # -- parse the single fetch ---------------------------------------------
    with timing.scope("parse payload"):
        extra_host = flat[:n_extra] if extra_payload is not None else None
        pos = n_extra
        caps = []
        for _ in arities:
            caps.append([[int(v) for v in flat[pos + r * 4:pos + (r + 1) * 4]]
                         for r in range(rows)])
            pos += rows * 4
        final_poly = [(int(a), int(b)) for a, b in
                      zip(flat[pos:pos + n_final],
                          flat[pos + n_final:pos + 2 * n_final])]
        pos += 2 * n_final
        pow_witness = int(flat[pos]); pow_response = int(flat[pos + 1]); pos += 2
        assert pow_response < (1 << (64 - config.proof_of_work_bits))
        pos += num_queries  # indices (already applied on device)
        sponge_out = flat[pos:pos + 12]; pos += 12

        opens = []
        for qq, w, levels in shapes:
            leaves_h = flat[pos:pos + qq * w].reshape(qq, w); pos += qq * w
            sibs_h = flat[pos:pos + qq * levels * 4].reshape(qq, levels, 4)
            pos += qq * levels * 4
            opens.append((leaves_h, sibs_h, levels))

        # host challenger sync: static count of unpopped squeezed outputs.
        # In device_state mode the transcript lives on device — no host state
        # to sync (challenger may be None).
        if device_state is None:
            m = _sim_remaining_outputs(k_pending, arities, rows, n_final,
                                       num_queries)
            challenger.sponge_state = [int(x) for x in sponge_out]
            challenger.input_buffer = []
            challenger.output_buffer = [int(x) for x in sponge_out[:m]]

        n_init = len(initial_trees)
        rounds = []
        for qi in range(num_queries):
            evals_proofs = []
            for leaves_h, sibs_h, levels in opens[:n_init]:
                evals_proofs.append((
                    [int(v) for v in leaves_h[qi]],
                    MerkleProof([[int(v) for v in sibs_h[qi, k]]
                                 for k in range(levels)])))
            steps = []
            for leaves_h, sibs_h, levels in opens[n_init:]:
                steps.append(FriQueryStep(
                    evals=_unflatten([int(v) for v in leaves_h[qi]]),
                    merkle_proof=MerkleProof([[int(v) for v in sibs_h[qi, k]]
                                              for k in range(levels)])))
            rounds.append(FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
                steps=steps))

        proof = FriProof(
            commit_phase_merkle_caps=caps,
            query_round_proofs=rounds,
            final_poly=final_poly,
            pow_witness=pow_witness,
        )
    return proof, extra_host


def _fri_committed_trees(coeffs, challenger, fri_params, final_poly_coeff_len,
                         max_num_query_steps, hasher=None):
    from plonky2_tpu.hash.hashers import PoseidonHasher

    global _LAST_PATH
    algebraic = (hasher is None or hasher is PoseidonHasher
                 or getattr(hasher, "algebraic", False))
    arities = tuple(fri_params.reduction_arity_bits)
    if (not _FORCE_HOST and algebraic and arities
            and challenger.hasher is PoseidonHasher):
        _LAST_PATH = "commit_fused"
        trees, coeffs = _fri_committed_trees_fused(coeffs, challenger,
                                                   fri_params, arities)
    else:
        _LAST_PATH = "host"
        trees, coeffs = _fri_committed_trees_host(coeffs, challenger,
                                                  fri_params, hasher)

    cap_height = fri_params.config.cap_height
    # dummy challenges for unified-shape recursion (reference fri/prover.rs:119-131)
    if max_num_query_steps is not None:
        zero_cap = [0] * ((1 << cap_height) * 4)
        for _ in range(len(fri_params.reduction_arity_bits), max_num_query_steps):
            challenger.observe_elements(zero_cap)
            challenger.get_extension_challenge(2)

    c0, c1 = np.asarray(coeffs[0]), np.asarray(coeffs[1])
    final_poly = [(int(a), int(b)) for a, b in zip(c0, c1)]
    for coeff in final_poly:
        challenger.observe_extension_element(coeff)
    if final_poly_coeff_len is not None:
        for _ in range(len(final_poly), final_poly_coeff_len):
            challenger.observe_extension_element((0, 0))

    return trees, final_poly


def _fri_committed_trees_fused(coeffs, challenger, fri_params, arities):
    from plonky2_tpu.hash.merkle import merkle_tree_from_device
    from plonky2_tpu.parallel import replicate

    rate_bits = fri_params.config.rate_bits
    cap_height = fri_params.config.cap_height
    lg_n = coeffs[0].shape[0].bit_length() - 1

    shift = fs.MULTIPLICATIVE_GROUP_GENERATOR
    shifts = []
    for ab in arities:
        shift = fs.exp(shift, 1 << ab)
        shifts.append(shift)

    pending = challenger.input_buffer
    fn = _fused_commit_fn(lg_n, arities, rate_bits, tuple(shifts), cap_height,
                          len(pending))
    sponge = jnp.asarray(np.asarray(challenger.sponge_state, dtype=np.uint64))
    pend = jnp.asarray(np.asarray(pending, dtype=np.uint64))
    step_arrays, packed = fn(replicate(coeffs[0]), replicate(coeffs[1]),
                             replicate(sponge), replicate(pend))

    flat = np.asarray(packed)  # ONE fetch: caps + final coeffs + sponge
    rows = 1 << cap_height
    pos = 0
    trees = []
    for i, (leaves, layers) in enumerate(step_arrays):
        cap_host = [[int(v) for v in flat[pos + r * 4:pos + (r + 1) * 4]]
                    for r in range(rows)]
        pos += rows * 4
        trees.append(merkle_tree_from_device(leaves, layers, cap_height, cap_host))
    n_final = (flat.shape[0] - pos - 12) // 2
    c0 = flat[pos:pos + n_final]
    c1 = flat[pos + n_final:pos + 2 * n_final]
    sponge_out = flat[pos + 2 * n_final:]

    # sync the host challenger to the device transcript: the fused program
    # ends right after a challenge draw (inputs flushed); the remaining
    # squeezed outputs are state[:RATE] minus the two beta pops
    from plonky2_tpu.hash.poseidon_constants import SPONGE_RATE

    challenger.sponge_state = [int(x) for x in sponge_out]
    challenger.input_buffer = []
    challenger.output_buffer = [int(x) for x in sponge_out[:SPONGE_RATE - 2]]
    return trees, (c0, c1)


def _fri_committed_trees_host(coeffs, challenger, fri_params, hasher):
    rate_bits = fri_params.config.rate_bits
    cap_height = fri_params.config.cap_height
    shift = fs.MULTIPLICATIVE_GROUP_GENERATOR

    values = _initial_lde(coeffs, rate_bits)

    trees = []
    for arity_bits in fri_params.reduction_arity_bits:
        lg_len = values[0].shape[0].bit_length() - 1
        leaves = _fold_step_leaves(values, arity_bits, lg_len)
        tree = make_merkle_tree(leaves, cap_height, hasher)
        trees.append(tree)
        challenger.observe_cap(tree.cap)
        beta = challenger.get_extension_challenge(2)
        shift = fs.exp(shift, 1 << arity_bits)
        coeffs, values = _fold_coeffs_and_relde(
            coeffs, g.to_field(list(beta)), arity_bits, (rate_bits, shift)
        )

    return trees, coeffs


@persistent_jit(static_argnums=(1,))
def _initial_lde(coeffs, rate_bits):
    shift = fs.MULTIPLICATIVE_GROUP_GENERATOR
    return (ntt.lde_fft(coeffs[0], rate_bits, shift=shift),
            ntt.lde_fft(coeffs[1], rate_bits, shift=shift))


# -- proof of work ----------------------------------------------------------

_GRIND_CHUNK = 1 << 17


@persistent_jit(static_argnums=(3,))
def _grind_chunk(intermediate, witness_pos, start, pow_bits):
    """Search candidates [start, start+CHUNK) for pow_bits leading zeros in the
    duplexed response. Returns (found_any, first_candidate)."""
    cand = start + jax.lax.broadcasted_iota(jnp.uint64, (_GRIND_CHUNK, 1), 0)[:, 0]
    states = jnp.broadcast_to(intermediate, (_GRIND_CHUNK, 12))
    states = jnp.where(
        jax.lax.broadcasted_iota(jnp.int32, (_GRIND_CHUNK, 12), 1) == witness_pos,
        cand[:, None],
        states,
    )
    out = ps.permute_dev_sm(jnp.swapaxes(states, 0, 1))
    resp = out[7]  # challenger pops state[RATE-1] first
    threshold = np.uint64(1) << np.uint64(64 - pow_bits)
    ok = resp < threshold
    found = jnp.any(ok)
    idx = jnp.argmax(ok)
    # one packed result -> one device->host fetch per chunk
    return jnp.stack([found.astype(jnp.uint64), cand[idx]])


def fri_proof_of_work(challenger, config) -> int:
    """Grind for a witness making the next challenge have pow_bits leading
    zeros (reference fri/prover.rs:152-202). Any valid witness verifies."""
    from plonky2_tpu.hash.hashers import PoseidonHasher

    if challenger.hasher is not PoseidonHasher and not getattr(
        challenger.hasher, "algebraic", True
    ):
        return _fri_proof_of_work_host(challenger, config)

    pow_bits = config.proof_of_work_bits
    intermediate = list(challenger.sponge_state)
    witness_pos = len(challenger.input_buffer)
    assert witness_pos < 12
    for i, x in enumerate(challenger.input_buffer):
        intermediate[i] = x

    inter_dev = g.to_field(intermediate)
    start = 0
    while True:
        res = np.asarray(_grind_chunk(
            inter_dev, witness_pos, jnp.asarray(np.uint64(start)), pow_bits
        ))
        if res[0]:
            pow_witness = int(res[1])
            break
        start += _GRIND_CHUNK
        assert start < fs.P, "Proof of work failed (searched entire field)"

    challenger.observe_element(pow_witness)
    pow_response = challenger.get_challenge()
    assert pow_response < (1 << (64 - pow_bits))
    return pow_witness


# -- query rounds -----------------------------------------------------------

def _fri_prover_query_rounds(initial_merkle_trees, trees, challenger, n, fri_params):
    indices = [c % n for c in challenger.get_n_challenges(fri_params.config.num_query_rounds)]
    # Packed extraction: per-tree device gathers (async dispatches), all
    # results concatenated into ONE flat device array and fetched in a
    # single transfer — the per-tree fetch version paid one ~30-100ms
    # tunnel round trip per tree (7+ trees per proof).
    tree_indices = [indices] * len(initial_merkle_trees)
    xs = indices
    for i in range(len(trees)):
        xs = [x >> fri_params.reduction_arity_bits[i] for x in xs]
        tree_indices.append(xs)
    all_opens = _open_many_packed(list(initial_merkle_trees) + list(trees),
                                  tree_indices)
    initial_opens = all_opens[:len(initial_merkle_trees)]
    step_opens = all_opens[len(initial_merkle_trees):]
    rounds = []
    for qi in range(len(indices)):
        steps = [
            FriQueryStep(
                evals=_unflatten(step_opens[i][qi][0]),
                merkle_proof=step_opens[i][qi][1],
            )
            for i in range(len(trees))
        ]
        rounds.append(FriQueryRound(
            initial_trees_proof=FriInitialTreeProof(
                evals_proofs=[opens[qi] for opens in initial_opens]),
            steps=steps,
        ))
    return rounds


@partial(jax.jit, static_argnums=())
def _pack_flat(arrs):
    return jnp.concatenate([jnp.ravel(a).astype(jnp.uint64) for a in arrs])


def _open_many_packed(all_trees, tree_indices):
    """Open many indices on many trees with ONE device->host transfer.

    Trees with `open_many_dev` contribute device gathers packed into a
    single flat fetch; others (host/keccak trees) fall back to their own
    open_many/leaf+prove path."""
    from plonky2_tpu.hash.merkle import MerkleProof

    dev_parts = []  # (slot, q, levels, width, leaf_size, sib_size)
    results: list = [None] * len(all_trees)
    for slot, (tree, idxs) in enumerate(zip(all_trees, tree_indices)):
        omd = getattr(tree, "open_many_dev", None)
        if omd is None:
            om = getattr(tree, "open_many", None)
            results[slot] = (om(idxs) if om is not None
                             else [(tree.leaf(i), tree.prove(i)) for i in idxs])
            continue
        leaves, sibs = omd(idxs)
        # uniform placement before cross-tree concatenation (trees built
        # inside/outside a mesh carry different commitments); tiny arrays
        from plonky2_tpu.parallel import replicate

        leaves, sibs = replicate(leaves), replicate(sibs)
        q, w = leaves.shape
        levels = sibs.shape[1]
        dev_parts.append((slot, q, levels, w, leaves, sibs))

    if dev_parts:
        flat = np.asarray(_pack_flat(tuple(
            x for p in dev_parts for x in (p[4], p[5]))))
        pos = 0
        for slot, q, levels, w, _, _ in dev_parts:
            leaves = flat[pos:pos + q * w].reshape(q, w)
            pos += q * w
            sibs = flat[pos:pos + q * levels * 4].reshape(q, levels, 4)
            pos += q * levels * 4
            results[slot] = [
                ([int(v) for v in leaves[qi]],
                 MerkleProof([[int(v) for v in sibs[qi, k]]
                              for k in range(levels)]))
                for qi in range(q)
            ]
    return results


def _unflatten(flat: list[int]) -> list[tuple]:
    return [(flat[i], flat[i + 1]) for i in range(0, len(flat), 2)]


def _fri_proof_of_work_host(challenger, config) -> int:
    """Host grind for non-algebraic (keccak) transcripts, vectorized over
    candidate batches with the numpy keccak."""
    from plonky2_tpu.hash import keccak as kk

    pow_bits = config.proof_of_work_bits
    threshold = 1 << (64 - pow_bits)
    base_state = list(challenger.sponge_state)
    pos = len(challenger.input_buffer)
    assert pos < 12
    for i, x in enumerate(challenger.input_buffer):
        base_state[i] = x

    chunk = 1 << 14
    base_bytes = np.frombuffer(
        b"".join(int(x).to_bytes(8, "little") for x in base_state), dtype=np.uint8
    )
    start = 0
    while True:
        states = np.tile(base_bytes, (chunk, 1)).copy()
        cands = np.arange(start, start + chunk, dtype=np.uint64)
        states[:, pos * 8:(pos + 1) * 8] = (
            cands.astype("<u8").view(np.uint8).reshape(chunk, 8)
        )
        # 3 onion layers give 12 candidate words per row
        d = kk.keccak256_batch(states)
        words = [np.ascontiguousarray(d).view("<u8").reshape(chunk, 4)]
        for _ in range(2):
            d = kk.keccak256_batch(d)
            words.append(np.ascontiguousarray(d).view("<u8").reshape(chunk, 4))
        w = np.concatenate(words, axis=1)  # [chunk, 12]
        ok = w < np.uint64(fs.P)
        # response = 8th accepted word (challenger pops state[RATE-1] first)
        csum = np.cumsum(ok, axis=1)
        has8 = csum[:, -1] >= 8
        first8 = np.argmax(csum == 8, axis=1)
        resp = w[np.arange(chunk), first8]
        good = has8 & (resp < np.uint64(threshold))
        idx = np.nonzero(good)[0]
        if idx.size:
            pow_witness = int(cands[idx[0]])
            break
        start += chunk
        assert start < fs.P, "Proof of work failed"

    challenger.observe_element(pow_witness)
    pow_response = challenger.get_challenge()
    assert pow_response < threshold
    return pow_witness
