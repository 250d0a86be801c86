"""Compressed proofs: Merkle-path deduplication across query rounds plus
removal of FRI evaluations the verifier can re-infer
(reference plonk/proof.rs:58-257, fri/proof.rs:125-330,
hash/path_compression.rs).
"""

from __future__ import annotations

from dataclasses import dataclass

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.proof import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
)
from plonky2_tpu.fri.verifier import (
    PrecomputedReducedOpenings,
    compute_evaluation,
    fri_combine_initial,
)
from plonky2_tpu.hash.merkle import MerkleProof
from plonky2_tpu.plonk.get_challenges import get_challenges
from plonky2_tpu.util import reverse_bits


@dataclass
class CompressedFriQueryRounds:
    indices: list[int]
    initial_trees_proofs: dict  # index -> FriInitialTreeProof
    steps: list  # per reduction: dict coset_index -> FriQueryStep (eval removed)


@dataclass
class CompressedFriProof:
    commit_phase_merkle_caps: list
    query_round_proofs: CompressedFriQueryRounds
    final_poly: list
    pow_witness: int


@dataclass
class CompressedProof:
    wires_cap: list
    plonk_zs_partial_products_cap: list
    quotient_polys_cap: list
    openings: object
    opening_proof: CompressedFriProof


@dataclass
class CompressedProofWithPublicInputs:
    proof: CompressedProof
    public_inputs: list[int]


# -- Merkle path (de)compression (reference hash/path_compression.rs) ---------


def compress_merkle_proofs(cap_height, indices, proofs):
    assert proofs
    height = cap_height + len(proofs[0].siblings)
    num_leaves = 1 << height
    known = [False] * (2 * num_leaves)
    for i in indices:
        for j in range(height - cap_height):
            known[(i + num_leaves) >> j] = True
    out = []
    for i, p in zip(indices, proofs):
        siblings = []
        index = i + num_leaves
        for sibling in p.siblings:
            sibling_index = index ^ 1
            if not known[sibling_index]:
                siblings.append(sibling)
                known[sibling_index] = True
            index >>= 1
            known[index] = True
        out.append(MerkleProof(siblings))
    return out


def decompress_merkle_proofs(leaves_data, leaves_indices, compressed_proofs,
                             height, cap_height, hasher):
    num_leaves = 1 << height
    seen: dict = {}
    for i, v in zip(leaves_indices, leaves_data):
        d = hasher.hash_or_noop(v)
        seen[i + num_leaves] = tuple(d) if isinstance(d, list) else d
    sib_iters = [iter(p.siblings) for p in compressed_proofs]
    for layer_height in range(height - cap_height):
        for i, it in zip(leaves_indices, sib_iters):
            index = (i + num_leaves) >> layer_height
            current = seen[index]
            sibling_index = index ^ 1
            if sibling_index not in seen:
                s = next(it)
                seen[sibling_index] = tuple(s) if isinstance(s, list) else s
            sibling = seen[sibling_index]
            cur_l = list(current) if isinstance(current, tuple) else current
            sib_l = list(sibling) if isinstance(sibling, tuple) else sibling
            if index % 2 == 0:
                parent = hasher.two_to_one(cur_l, sib_l)
            else:
                parent = hasher.two_to_one(sib_l, cur_l)
            seen[index >> 1] = tuple(parent) if isinstance(parent, list) else parent
    out = []
    for i in leaves_indices:
        siblings = []
        index = i + num_leaves
        for _ in range(height - cap_height):
            s = seen[index ^ 1]
            siblings.append(list(s) if isinstance(s, tuple) else s)
            index >>= 1
        out.append(MerkleProof(siblings))
    return out


# -- FRI proof (de)compression ------------------------------------------------


def compress_fri_proof(proof: FriProof, indices, params) -> CompressedFriProof:
    cap_height = params.config.cap_height
    arity_bits = list(params.reduction_arity_bits)
    num_reductions = len(arity_bits)
    num_initial_trees = len(proof.query_round_proofs[0].initial_trees_proof.evals_proofs)

    it_indices = [[] for _ in range(num_initial_trees)]
    it_leaves = [[] for _ in range(num_initial_trees)]
    it_proofs = [[] for _ in range(num_initial_trees)]
    st_indices = [[] for _ in range(num_reductions)]
    st_evals = [[] for _ in range(num_reductions)]
    st_proofs = [[] for _ in range(num_reductions)]

    for index, qrp in zip(indices, proof.query_round_proofs):
        for i, (leaves, p) in enumerate(qrp.initial_trees_proof.evals_proofs):
            it_indices[i].append(index)
            it_leaves[i].append(leaves)
            it_proofs[i].append(p)
        for i, step in enumerate(qrp.steps):
            within = index & ((1 << arity_bits[i]) - 1)
            index >>= arity_bits[i]
            st_indices[i].append(index)
            evals = list(step.evals)
            evals.pop(within)  # the verifier re-infers this element
            st_evals[i].append(evals)
            st_proofs[i].append(step.merkle_proof)

    it_proofs = [compress_merkle_proofs(cap_height, js, ps)
                 for js, ps in zip(it_indices, it_proofs)]
    st_proofs = [compress_merkle_proofs(cap_height, js, ps)
                 for js, ps in zip(st_indices, st_proofs)]

    cq = CompressedFriQueryRounds(
        indices=list(indices), initial_trees_proofs={},
        steps=[{} for _ in range(num_reductions)],
    )
    for i, index in enumerate(indices):
        initial = FriInitialTreeProof(evals_proofs=[
            (it_leaves[j][i], it_proofs[j][i]) for j in range(num_initial_trees)
        ])
        cq.initial_trees_proofs.setdefault(index, initial)
        for j in range(num_reductions):
            index >>= arity_bits[j]
            cq.steps[j].setdefault(
                index, FriQueryStep(evals=st_evals[j][i], merkle_proof=st_proofs[j][i])
            )
    return CompressedFriProof(
        commit_phase_merkle_caps=proof.commit_phase_merkle_caps,
        query_round_proofs=cq,
        final_poly=proof.final_poly,
        pow_witness=proof.pow_witness,
    )


def compress(proof_with_pis, verifier_data, common) -> CompressedProofWithPublicInputs:
    gc = common.generic_config()
    public_inputs_hash = gc.inner_hasher.hash_no_pad(proof_with_pis.public_inputs)
    challenges = get_challenges(
        proof_with_pis, public_inputs_hash, verifier_data.circuit_digest, common
    )
    indices = challenges.fri_challenges.fri_query_indices
    p = proof_with_pis.proof
    return CompressedProofWithPublicInputs(
        proof=CompressedProof(
            wires_cap=p.wires_cap,
            plonk_zs_partial_products_cap=p.plonk_zs_partial_products_cap,
            quotient_polys_cap=p.quotient_polys_cap,
            openings=p.openings,
            opening_proof=compress_fri_proof(
                p.opening_proof, indices, common.fri_params
            ),
        ),
        public_inputs=list(proof_with_pis.public_inputs),
    )


def _get_inferred_elements(cpwp, challenges, common):
    """Re-derive the dropped FRI evals (reference get_challenges.rs:195-257)."""
    zeta = challenges.plonk_zeta
    fri = challenges.fri_challenges
    out = []
    seen_by_depth = [set() for _ in common.fri_params.reduction_arity_bits]
    precomputed = PrecomputedReducedOpenings(
        cpwp.proof.openings.to_fri_openings(), fri.fri_alpha
    )
    log_n = common.degree_bits + common.config.fri_config.rate_bits
    instance = common.get_fri_instance(zeta)
    for x_index in fri.fri_query_indices:
        subgroup_x = fs.mul(
            fs.MULTIPLICATIVE_GROUP_GENERATOR,
            fs.exp(fs.primitive_root_of_unity(log_n), reverse_bits(x_index, log_n)),
        )
        old_eval = fri_combine_initial(
            instance,
            cpwp.proof.opening_proof.query_round_proofs.initial_trees_proofs[x_index],
            fri.fri_alpha, subgroup_x, precomputed, common.fri_params,
        )
        for i, ab in enumerate(common.fri_params.reduction_arity_bits):
            coset_index = x_index >> ab
            if coset_index in seen_by_depth[i]:
                break
            seen_by_depth[i].add(coset_index)
            out.append(old_eval)
            within = x_index & ((1 << ab) - 1)
            evals = list(
                cpwp.proof.opening_proof.query_round_proofs.steps[i][coset_index].evals
            )
            evals.insert(within, old_eval)
            old_eval = compute_evaluation(subgroup_x, within, ab, evals, fri.fri_betas[i])
            subgroup_x = fs.exp(subgroup_x, 1 << ab)
            x_index = coset_index
    return out


def decompress_fri_proof(cfp: CompressedFriProof, challenges, inferred, params,
                         hasher) -> FriProof:
    indices = challenges.fri_challenges.fri_query_indices
    inferred = iter(inferred)
    cap_height = params.config.cap_height
    arity_bits = list(params.reduction_arity_bits)
    num_reductions = len(arity_bits)
    num_initial_trees = len(
        next(iter(cfp.query_round_proofs.initial_trees_proofs.values())).evals_proofs
    )

    it_indices = [[] for _ in range(num_initial_trees)]
    it_leaves = [[] for _ in range(num_initial_trees)]
    it_proofs = [[] for _ in range(num_initial_trees)]
    st_indices = [[] for _ in range(num_reductions)]
    st_evals = [[] for _ in range(num_reductions)]
    st_flat = [[] for _ in range(num_reductions)]
    st_proofs = [[] for _ in range(num_reductions)]
    height = params.degree_bits + params.config.rate_bits
    heights = []
    h = height
    for ab in arity_bits:
        h -= ab
        heights.append(h)

    evals_by_depth = [dict() for _ in range(num_reductions)]
    for index in indices:
        initial = cfp.query_round_proofs.initial_trees_proofs[index]
        for i, (leaves, p) in enumerate(initial.evals_proofs):
            it_indices[i].append(index)
            it_leaves[i].append(leaves)
            it_proofs[i].append(p)
        for i in range(num_reductions):
            within = index & ((1 << arity_bits[i]) - 1)
            index >>= arity_bits[i]
            step = cfp.query_round_proofs.steps[i][index]
            st_indices[i].append(index)
            if index in evals_by_depth[i]:
                evals = evals_by_depth[i][index]
            else:
                evals = list(step.evals)
                evals.insert(within, next(inferred))
                evals_by_depth[i][index] = evals
            st_evals[i].append(evals)
            st_flat[i].append([c for e in evals for c in e])
            st_proofs[i].append(step.merkle_proof)

    it_proofs = [
        decompress_merkle_proofs(ls, js, ps, height, cap_height, hasher)
        for ls, js, ps in zip(it_leaves, it_indices, it_proofs)
    ]
    st_proofs = [
        decompress_merkle_proofs(ls, js, ps, hh, cap_height, hasher)
        for ls, js, ps, hh in zip(st_flat, st_indices, st_proofs, heights)
    ]

    rounds = []
    for i, _ in enumerate(indices):
        initial = FriInitialTreeProof(evals_proofs=[
            (it_leaves[j][i], it_proofs[j][i]) for j in range(num_initial_trees)
        ])
        steps = [
            FriQueryStep(evals=st_evals[j][i], merkle_proof=st_proofs[j][i])
            for j in range(num_reductions)
        ]
        rounds.append(FriQueryRound(initial_trees_proof=initial, steps=steps))
    return FriProof(
        commit_phase_merkle_caps=cfp.commit_phase_merkle_caps,
        query_round_proofs=rounds,
        final_poly=cfp.final_poly,
        pow_witness=cfp.pow_witness,
    )


def decompress(cpwp: CompressedProofWithPublicInputs, verifier_data, common):
    from plonky2_tpu.plonk.proof import Proof, ProofWithPublicInputs

    gc = common.generic_config()
    public_inputs_hash = gc.inner_hasher.hash_no_pad(cpwp.public_inputs)
    challenges = get_challenges(
        cpwp, public_inputs_hash, verifier_data.circuit_digest, common
    )
    inferred = _get_inferred_elements(cpwp, challenges, common)
    p = cpwp.proof
    return ProofWithPublicInputs(
        proof=Proof(
            wires_cap=p.wires_cap,
            plonk_zs_partial_products_cap=p.plonk_zs_partial_products_cap,
            quotient_polys_cap=p.quotient_polys_cap,
            openings=p.openings,
            opening_proof=decompress_fri_proof(
                p.opening_proof, challenges, inferred, common.fri_params, gc.hasher
            ),
        ),
        public_inputs=list(cpwp.public_inputs),
    )


def verify_compressed(cpwp: CompressedProofWithPublicInputs, verifier_data, common) -> None:
    """Decompress then verify (reference circuit_data.rs verify_compressed)."""
    from plonky2_tpu.plonk.verifier import verify

    verify(decompress(cpwp, verifier_data, common), verifier_data, common)
