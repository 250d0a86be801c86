"""Byte-exact proof serialization (reference util/serialization/mod.rs).

Format notes (all integers little-endian):
  - field element: canonical u64 (write_field, mod.rs:1254)
  - extension element: D consecutive field elements (:1275)
  - hash/digest: 4 field elements; Merkle cap: 2^cap_height digests, no
    length prefix (:1359,1394)
  - Merkle proof: u8 sibling count then digests (:1470)
  - opening set / FRI proof / proof: fixed-shape concatenation; lengths are
    derived from CommonCircuitData on read (:1436-1620,1977)
  - ProofWithPublicInputs: proof ++ u64 pi-count ++ public inputs (:2001)
"""

from __future__ import annotations

import struct

from plonky2_tpu.fri.proof import (
    FriInitialTreeProof,
    FriProof,
    FriQueryRound,
    FriQueryStep,
)
from plonky2_tpu.hash.merkle import MerkleProof
from plonky2_tpu.plonk.proof import OpeningSet, Proof, ProofWithPublicInputs

D = 2


class Writer:
    def __init__(self):
        self.buf = bytearray()

    def write_u8(self, x: int) -> None:
        self.buf.append(x)

    def write_usize(self, x: int) -> None:
        self.buf += struct.pack("<Q", x)

    def write_field(self, x: int) -> None:
        self.buf += struct.pack("<Q", x)

    def write_field_vec(self, v) -> None:
        for x in v:
            self.write_field(x)

    def write_field_ext(self, x) -> None:
        for c in x:
            self.write_field(c)

    def write_field_ext_vec(self, v) -> None:
        for x in v:
            self.write_field_ext(x)

    def write_hash(self, h) -> None:
        if isinstance(h, (bytes, bytearray)):
            self.buf += bytes(h)  # BytesHash raw bytes (reference write_hash)
        else:
            self.write_field_vec(h)

    def write_merkle_cap(self, cap) -> None:
        for h in cap:
            self.write_hash(h)

    def write_merkle_proof(self, p: MerkleProof) -> None:
        self.write_u8(len(p.siblings))
        for h in p.siblings:
            self.write_hash(h)

    def write_opening_set(self, os: OpeningSet) -> None:
        self.write_field_ext_vec(os.constants)
        self.write_field_ext_vec(os.plonk_sigmas)
        self.write_field_ext_vec(os.wires)
        self.write_field_ext_vec(os.plonk_zs)
        self.write_field_ext_vec(os.plonk_zs_next)
        self.write_field_ext_vec(os.lookup_zs)
        self.write_field_ext_vec(os.lookup_zs_next)
        self.write_field_ext_vec(os.partial_products)
        self.write_field_ext_vec(os.quotient_polys)

    def write_fri_proof(self, fp: FriProof) -> None:
        for cap in fp.commit_phase_merkle_caps:
            self.write_merkle_cap(cap)
        for fqr in fp.query_round_proofs:
            for v, p in fqr.initial_trees_proof.evals_proofs:
                self.write_field_vec(v)
                self.write_merkle_proof(p)
            for fqs in fqr.steps:
                self.write_field_ext_vec(fqs.evals)
                self.write_merkle_proof(fqs.merkle_proof)
        self.write_field_ext_vec(fp.final_poly)
        self.write_field(fp.pow_witness)

    def write_proof(self, proof: Proof) -> None:
        self.write_merkle_cap(proof.wires_cap)
        self.write_merkle_cap(proof.plonk_zs_partial_products_cap)
        self.write_merkle_cap(proof.quotient_polys_cap)
        self.write_opening_set(proof.openings)
        self.write_fri_proof(proof.opening_proof)

    def write_proof_with_public_inputs(self, pwp: ProofWithPublicInputs) -> None:
        self.write_proof(pwp.proof)
        self.write_usize(len(pwp.public_inputs))
        self.write_field_vec(pwp.public_inputs)

    # -- compressed proofs (reference serialization/mod.rs:2032-2126) --------

    def write_u32(self, x: int) -> None:
        self.buf += struct.pack("<I", x)

    def write_compressed_fri_proof(self, cfp, params) -> None:
        """Reference write_compressed_fri_proof: caps, the 28 original query
        indices as u32s, initial proofs for the sorted+deduped indices, then
        per reduction the (index >> arity)-deduped steps — each step's evals
        missing the one element the verifier re-infers."""
        for cap in cfp.commit_phase_merkle_caps:
            self.write_merkle_cap(cap)
        q = cfp.query_round_proofs
        for i in q.indices:
            self.write_u32(i)
        indices = sorted(set(q.indices))
        for i in indices:
            for v, p in q.initial_trees_proofs[i].evals_proofs:
                self.write_field_vec(v)
                self.write_merkle_proof(p)
        for a, h in zip(params.reduction_arity_bits, q.steps):
            indices = sorted({i >> a for i in indices})
            for i in indices:
                fqs = h[i]
                self.write_field_ext_vec(fqs.evals)
                self.write_merkle_proof(fqs.merkle_proof)
        self.write_field_ext_vec(cfp.final_poly)
        self.write_field(cfp.pow_witness)

    def write_compressed_proof(self, proof, params) -> None:
        self.write_merkle_cap(proof.wires_cap)
        self.write_merkle_cap(proof.plonk_zs_partial_products_cap)
        self.write_merkle_cap(proof.quotient_polys_cap)
        self.write_opening_set(proof.openings)
        self.write_compressed_fri_proof(proof.opening_proof, params)

    def write_compressed_proof_with_public_inputs(self, cpwp, params) -> None:
        """Reference layout: proof then the public inputs with NO length
        prefix (read_field_vec(remaining), mod.rs:1144-1160)."""
        self.write_compressed_proof(cpwp.proof, params)
        self.write_field_vec(cpwp.public_inputs)


class Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0

    def read_u8(self) -> int:
        x = self.data[self.pos]
        self.pos += 1
        return x

    def read_usize(self) -> int:
        (x,) = struct.unpack_from("<Q", self.data, self.pos)
        self.pos += 8
        return x

    def read_field(self) -> int:
        return self.read_usize()

    def read_field_vec(self, n: int) -> list[int]:
        return [self.read_field() for _ in range(n)]

    def read_field_ext(self) -> tuple:
        return tuple(self.read_field() for _ in range(D))

    def read_field_ext_vec(self, n: int) -> list[tuple]:
        return [self.read_field_ext() for _ in range(n)]

    def __init_hasher__(self, hasher):
        self.hasher = hasher

    def read_hash(self) -> list[int] | bytes:
        hasher = getattr(self, "hasher", None)
        if hasher is not None and not getattr(hasher, "algebraic", True):
            out = bytes(self.data[self.pos:self.pos + hasher.HASH_SIZE])
            self.pos += hasher.HASH_SIZE
            return out
        return self.read_field_vec(4)

    def read_merkle_cap(self, cap_height: int) -> list:
        return [self.read_hash() for _ in range(1 << cap_height)]

    def read_merkle_proof(self) -> MerkleProof:
        n = self.read_u8()
        return MerkleProof(siblings=[self.read_hash() for _ in range(n)])

    def read_opening_set(self, common) -> OpeningSet:
        config = common.config
        nc = config.num_challenges
        n_lookups = common.num_all_lookup_polys()
        return OpeningSet(
            constants=self.read_field_ext_vec(common.num_constants),
            plonk_sigmas=self.read_field_ext_vec(config.num_routed_wires),
            wires=self.read_field_ext_vec(config.num_wires),
            plonk_zs=self.read_field_ext_vec(nc),
            plonk_zs_next=self.read_field_ext_vec(nc),
            lookup_zs=self.read_field_ext_vec(n_lookups),
            lookup_zs_next=self.read_field_ext_vec(n_lookups),
            partial_products=self.read_field_ext_vec(nc * common.num_partial_products),
            quotient_polys=self.read_field_ext_vec(common.num_quotient_polys()),
        )

    def read_fri_proof(self, num_leaves_per_oracle, params) -> FriProof:
        caps = [
            self.read_merkle_cap(params.config.cap_height)
            for _ in params.reduction_arity_bits
        ]
        rounds = []
        for _ in range(params.config.num_query_rounds):
            evals_proofs = []
            for n in num_leaves_per_oracle:
                v = self.read_field_vec(n)
                p = self.read_merkle_proof()
                evals_proofs.append((v, p))
            steps = [
                FriQueryStep(
                    evals=self.read_field_ext_vec(1 << arity_bits),
                    merkle_proof=self.read_merkle_proof(),
                )
                for arity_bits in params.reduction_arity_bits
            ]
            rounds.append(FriQueryRound(
                initial_trees_proof=FriInitialTreeProof(evals_proofs=evals_proofs),
                steps=steps,
            ))
        final_poly = self.read_field_ext_vec(params.final_poly_len())
        pow_witness = self.read_field()
        return FriProof(
            commit_phase_merkle_caps=caps,
            query_round_proofs=rounds,
            final_poly=final_poly,
            pow_witness=pow_witness,
        )

    def read_proof(self, common) -> Proof:
        config = common.config
        cap_height = config.fri_config.cap_height
        wires_cap = self.read_merkle_cap(cap_height)
        zs_pp_cap = self.read_merkle_cap(cap_height)
        quotient_cap = self.read_merkle_cap(cap_height)
        openings = self.read_opening_set(common)
        salt = 4 if common.fri_params.hiding else 0
        num_leaves_per_oracle = [
            common.num_preprocessed_polys(),
            config.num_wires + salt,
            common.num_zs_partial_products_polys() + common.num_all_lookup_polys() + salt,
            common.num_quotient_polys() + salt,
        ]
        opening_proof = self.read_fri_proof(num_leaves_per_oracle, common.fri_params)
        return Proof(
            wires_cap=wires_cap,
            plonk_zs_partial_products_cap=zs_pp_cap,
            quotient_polys_cap=quotient_cap,
            openings=openings,
            opening_proof=opening_proof,
        )

    def read_proof_with_public_inputs(self, common) -> ProofWithPublicInputs:
        proof = self.read_proof(common)
        n = self.read_usize()
        public_inputs = self.read_field_vec(n)
        return ProofWithPublicInputs(proof=proof, public_inputs=public_inputs)

    # -- compressed proofs (reference serialization/mod.rs:1042-1160) --------

    def read_u32(self) -> int:
        (x,) = struct.unpack_from("<I", self.data, self.pos)
        self.pos += 4
        return x

    def read_compressed_fri_proof(self, num_leaves_per_oracle, params):
        from plonky2_tpu.plonk.compressed import (
            CompressedFriProof,
            CompressedFriQueryRounds,
        )

        caps = [
            self.read_merkle_cap(params.config.cap_height)
            for _ in params.reduction_arity_bits
        ]
        original_indices = [self.read_u32()
                            for _ in range(params.config.num_query_rounds)]
        indices = sorted(set(original_indices))
        initial = {}
        for i in indices:
            evals_proofs = [(self.read_field_vec(n), self.read_merkle_proof())
                            for n in num_leaves_per_oracle]
            initial[i] = FriInitialTreeProof(evals_proofs=evals_proofs)
        steps = []
        for a in params.reduction_arity_bits:
            indices = sorted({i >> a for i in indices})
            d = {}
            for i in indices:
                d[i] = FriQueryStep(
                    evals=self.read_field_ext_vec((1 << a) - 1),
                    merkle_proof=self.read_merkle_proof(),
                )
            steps.append(d)
        final_poly = self.read_field_ext_vec(params.final_poly_len())
        pow_witness = self.read_field()
        return CompressedFriProof(
            commit_phase_merkle_caps=caps,
            query_round_proofs=CompressedFriQueryRounds(
                indices=original_indices, initial_trees_proofs=initial,
                steps=steps),
            final_poly=final_poly,
            pow_witness=pow_witness,
        )

    def read_compressed_proof(self, common):
        from plonky2_tpu.plonk.compressed import CompressedProof

        config = common.config
        cap_height = config.fri_config.cap_height
        wires_cap = self.read_merkle_cap(cap_height)
        zs_pp_cap = self.read_merkle_cap(cap_height)
        quotient_cap = self.read_merkle_cap(cap_height)
        openings = self.read_opening_set(common)
        salt = 4 if common.fri_params.hiding else 0
        num_leaves_per_oracle = [
            common.num_preprocessed_polys(),
            config.num_wires + salt,
            common.num_zs_partial_products_polys() + common.num_all_lookup_polys() + salt,
            common.num_quotient_polys() + salt,
        ]
        opening_proof = self.read_compressed_fri_proof(num_leaves_per_oracle,
                                                       common.fri_params)
        return CompressedProof(
            wires_cap=wires_cap,
            plonk_zs_partial_products_cap=zs_pp_cap,
            quotient_polys_cap=quotient_cap,
            openings=openings,
            opening_proof=opening_proof,
        )

    def read_compressed_proof_with_public_inputs(self, common):
        from plonky2_tpu.plonk.compressed import CompressedProofWithPublicInputs

        proof = self.read_compressed_proof(common)
        public_inputs = self.read_field_vec((len(self.data) - self.pos) // 8)
        return CompressedProofWithPublicInputs(proof=proof,
                                               public_inputs=public_inputs)


def proof_to_bytes(pwp: ProofWithPublicInputs) -> bytes:
    w = Writer()
    w.write_proof_with_public_inputs(pwp)
    return bytes(w.buf)


def proof_from_bytes(data: bytes, common) -> ProofWithPublicInputs:
    r = Reader(data)
    r.hasher = common.generic_config().hasher
    pwp = r.read_proof_with_public_inputs(common)
    assert r.pos == len(data), f"{len(data) - r.pos} trailing bytes"
    return pwp


def compressed_proof_to_bytes(cpwp, common) -> bytes:
    w = Writer()
    w.write_compressed_proof_with_public_inputs(cpwp, common.fri_params)
    return bytes(w.buf)


def compressed_proof_from_bytes(data: bytes, common):
    r = Reader(data)
    r.hasher = common.generic_config().hasher
    cpwp = r.read_compressed_proof_with_public_inputs(common)
    assert r.pos == len(data), f"{len(data) - r.pos} trailing bytes"
    return cpwp
