"""Per-byte GOLDEN tests of the serializer against hand-computed layouts.

The byte format is the reference's (util/serialization/mod.rs:55-120):
  - field element   -> canonical u64, little-endian      (write_field)
  - extension elt   -> D=2 coefficients in order         (write_field_ext)
  - HashOut         -> 4 field elements                  (write_hash)
  - BytesHash       -> raw bytes                         (write_hash)
  - MerkleCap       -> digests in index order            (write_merkle_cap)
  - MerkleProof     -> u8 sibling count, then digests    (write_merkle_proof)
  - usize           -> u64 little-endian                 (write_usize)
  - ProofWithPublicInputs -> wires cap | zs/pp cap | quotient cap |
      openings (constants, sigmas, wires, zs, zs_next, lookup_zs,
      lookup_zs_next, partial_products, quotients) | FRI proof
      (commit caps | per query: initial evals+proofs, steps | final poly |
      pow witness) | usize PI count | PIs

Every byte below is written out by hand (struct.pack), NOT via the Writer
under test, so a format drift in Writer/Reader cannot hide."""

import struct

from plonky2_tpu.hash.merkle import MerkleProof
from plonky2_tpu.plonk.serialization import Reader, Writer


def le(x):
    return struct.pack("<Q", x)


def test_field_and_ext_layout():
    w = Writer()
    w.write_field(0)
    w.write_field(1)
    w.write_field(0xDEADBEEF12345678)
    w.write_field_ext((3, 5))
    assert bytes(w.buf) == (
        le(0) + le(1) + le(0xDEADBEEF12345678) + le(3) + le(5))


def test_hash_and_cap_layout():
    w = Writer()
    w.write_hash([1, 2, 3, 4])
    assert bytes(w.buf) == le(1) + le(2) + le(3) + le(4)

    w = Writer()
    w.write_hash(b"\x01\x02\x03")  # BytesHash: raw bytes, no length prefix
    assert bytes(w.buf) == b"\x01\x02\x03"

    w = Writer()
    cap = [[10, 11, 12, 13], [20, 21, 22, 23]]
    w.write_merkle_cap(cap)
    assert bytes(w.buf) == b"".join(le(v) for row in cap for v in row)


def test_merkle_proof_layout():
    w = Writer()
    p = MerkleProof(siblings=[[1, 2, 3, 4], [5, 6, 7, 8]])
    w.write_merkle_proof(p)
    # u8 count prefix, then the digests
    assert bytes(w.buf) == (
        b"\x02" + b"".join(le(v) for v in (1, 2, 3, 4, 5, 6, 7, 8)))


def test_usize_layout():
    w = Writer()
    w.write_usize(7)
    w.write_usize(1 << 40)
    assert bytes(w.buf) == le(7) + le(1 << 40)


def test_opening_set_field_order():
    """OpeningSet serializes in the reference's field order, including
    lookup_zs/lookup_zs_next BETWEEN zs_next and partial_products
    (reference plonk/proof.rs OpeningSet serde order)."""
    from plonky2_tpu.plonk.proof import OpeningSet

    os_ = OpeningSet(
        constants=[(1, 2)],
        plonk_sigmas=[(3, 4)],
        wires=[(5, 6)],
        plonk_zs=[(7, 8)],
        plonk_zs_next=[(9, 10)],
        partial_products=[(13, 14)],
        quotient_polys=[(15, 16)],
        lookup_zs=[(11, 12)],
        lookup_zs_next=[(17, 18)],
    )
    w = Writer()
    w.write_opening_set(os_)
    expect = b"".join(le(v) for v in
                      (1, 2, 3, 4, 5, 6, 7, 8, 9, 10,   # ..zs_next
                       11, 12, 17, 18,                   # lookup_zs, _next
                       13, 14, 15, 16))                  # pp, quotients
    assert bytes(w.buf) == expect


def test_reader_inverts_hand_written_bytes():
    raw = le(42) + le(7) + le(9)
    r = Reader(raw)
    assert r.read_field() == 42
    assert r.read_field_ext() == (7, 9)
    assert r.pos == len(raw)


def test_fixture_proof_positional_layout():
    """Position-level check against a real committed artifact: the proof
    bytes START with the wires cap (16 digests × 4 felts, LE u64) and END
    with [usize PI count | PIs] — unpacked BY HAND with struct, compared
    to what the Reader parses into the proof object."""
    import pathlib

    fx = pathlib.Path(__file__).resolve().parent.parent / "fixtures"
    raw = (fx / "factorial.proof.bin").read_bytes()

    from plonky2_tpu.examples.factorial import build_and_prove  # noqa: F401
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.plonk.serialization import proof_from_bytes

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    initial = builder.add_virtual_target()
    cur = initial
    for i in range(2, 101):
        cur = builder.mul(cur, builder.constant(i))
    builder.register_public_input(initial)
    builder.register_public_input(cur)
    data = builder.build()
    pwp = proof_from_bytes(raw, data.common)

    # head: wires cap, hand-unpacked
    hand_cap = [list(struct.unpack("<4Q", raw[i * 32:(i + 1) * 32]))
                for i in range(16)]
    assert hand_cap == [list(d) for d in pwp.proof.wires_cap]

    # tail: usize count + public inputs, hand-unpacked
    n_pis = len(pwp.public_inputs)
    tail = raw[-(8 + 8 * n_pis):]
    assert struct.unpack("<Q", tail[:8])[0] == n_pis
    assert list(struct.unpack(f"<{n_pis}Q", tail[8:])) == pwp.public_inputs
