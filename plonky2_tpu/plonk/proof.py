"""Proof containers (reference plonk/proof.rs:34-420).

Extension-field values are D=2 tuples of Python ints; Merkle caps are lists of
4-felt digests. Everything here is host-side assembly — the bulk data lives in
the FRI proof's Merkle paths.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from plonky2_tpu.fri.proof import FriProof
from plonky2_tpu.fri.structure import FriOpeningBatch, FriOpenings
from plonky2_tpu.hash import poseidon as ps


@dataclass
class OpeningSet:
    """Purported evaluations of all committed polynomials at zeta (and the
    next-row point g*zeta for Z polys) — reference plonk/proof.rs:301."""

    constants: list[tuple]
    plonk_sigmas: list[tuple]
    wires: list[tuple]
    plonk_zs: list[tuple]
    plonk_zs_next: list[tuple]
    partial_products: list[tuple]
    quotient_polys: list[tuple]
    lookup_zs: list[tuple] = field(default_factory=list)
    lookup_zs_next: list[tuple] = field(default_factory=list)

    def to_fri_openings(self) -> FriOpenings:
        """Order must match CommonCircuitData.fri_all_polys
        (reference plonk/proof.rs:352-393)."""
        zeta_batch = FriOpeningBatch(
            values=(self.constants + self.plonk_sigmas + self.wires + self.plonk_zs
                    + self.partial_products + self.quotient_polys + self.lookup_zs)
        )
        zeta_next_batch = FriOpeningBatch(
            values=self.plonk_zs_next + self.lookup_zs_next
        )
        return FriOpenings(batches=[zeta_batch, zeta_next_batch])


@dataclass
class Proof:
    wires_cap: list
    plonk_zs_partial_products_cap: list
    quotient_polys_cap: list
    openings: OpeningSet
    opening_proof: FriProof


@dataclass
class ProofWithPublicInputs:
    proof: Proof
    public_inputs: list[int]

    def get_public_inputs_hash(self) -> list[int]:
        return ps.hash_no_pad(self.public_inputs)


@dataclass
class ProofChallenges:
    plonk_betas: list[int]
    plonk_gammas: list[int]
    plonk_alphas: list[int]
    plonk_deltas: list[int]
    plonk_zeta: tuple
    fri_challenges: object
