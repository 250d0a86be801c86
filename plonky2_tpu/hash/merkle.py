"""Merkle-cap trees with vectorized Poseidon layer hashing.

The reference builds per-subtree with rayon joins and an interleaved digest
buffer (hash/merkle_tree.rs:50-148). The TPU-native dual: every tree level is
ONE batched Poseidon call over all nodes of that level ([nodes, 12] lanes), a
log-depth sequence of fused XLA programs — no recursion, no interleaving.

A `MerkleCap` of height h is the h-th layer from the root: 2^h digests
replacing the root (shorter proofs + natural cross-device parallelism: each
cap subtree can live on its own shard).

Digest = 4 felts (HashOut). Leaves of width <= 4 pass through unhashed
(`hash_or_noop`, reference plonk/config.rs:63-74).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.util.export_cache import persistent_jit
from plonky2_tpu.hash import poseidon as ps
from plonky2_tpu.hash.poseidon_constants import SPONGE_RATE, SPONGE_WIDTH
from plonky2_tpu.util import reverse_bits


def hash_leaves_dev(leaves: jax.Array) -> jax.Array:
    """Batched hash_or_noop over [n, width] -> [n, 4] digests.

    Runs the sponge STATE-MAJOR ([12, n]) so the leaf batch owns the native
    vector tile — the [n, 12] layout kept the 12-wide state on the lane axis
    and used 12/128 lanes. On real TPU the whole sponge (all absorb chunks
    x 30 rounds) runs as one fused Pallas kernel
    (plonky2_tpu.ops.pallas_poseidon)."""
    from plonky2_tpu.ops import pallas_poseidon as _pp

    n, width = leaves.shape
    if width <= 4:
        pad = jnp.zeros((n, 4 - width), dtype=jnp.uint64)
        return jnp.concatenate([leaves, pad], axis=1) if width < 4 else leaves
    cols = jnp.swapaxes(leaves, 0, 1)  # [width, n]
    if _pp.should_use(n, width):
        return jnp.swapaxes(
            _pp.sponge_pallas(cols, interpret=_pp._INTERPRET), 0, 1)
    state = jnp.zeros((SPONGE_WIDTH, n), dtype=jnp.uint64)
    for i in range(0, width, SPONGE_RATE):
        chunk = cols[i : i + SPONGE_RATE]
        c = chunk.shape[0]
        state = jnp.concatenate([chunk, state[c:]], axis=0)
        state = ps.permute_dev_sm(state)
    return jnp.swapaxes(state[:4], 0, 1)


def compress_layer_dev(digests: jax.Array) -> jax.Array:
    """[2m, 4] digests -> [m, 4] parent digests (two_to_one compression)."""
    from plonky2_tpu.ops import pallas_poseidon as _pp

    m2 = digests.shape[0]
    pairs = jnp.swapaxes(digests.reshape(m2 // 2, 8), 0, 1)  # [8, m]
    if _pp.should_use(m2 // 2, 8):
        return jnp.swapaxes(
            _pp.sponge_pallas(pairs, interpret=_pp._INTERPRET), 0, 1)
    state = jnp.concatenate(
        [pairs, jnp.zeros((SPONGE_WIDTH - 8, m2 // 2), dtype=jnp.uint64)], axis=0
    )
    return jnp.swapaxes(ps.permute_dev_sm(state)[:4], 0, 1)


def hash_leaf_cols_dev(cols: jax.Array) -> jax.Array:
    """Batched hash_or_noop over NATURAL-ORDER columns [width, n] -> [4, n].

    The state-major dual of `hash_leaves_dev` with no transpose: this is the
    LDE's native [num_polys, N] layout, so the commit pipeline feeds the
    sponge directly."""
    from plonky2_tpu.ops import pallas_poseidon as _pp

    width, n = cols.shape
    if width <= 4:
        pad = jnp.zeros((4 - width, n), dtype=jnp.uint64)
        return jnp.concatenate([cols, pad], axis=0) if width < 4 else cols
    if _pp.should_use(n, width):
        return _pp.sponge_pallas(cols, interpret=_pp._INTERPRET)
    state = jnp.zeros((SPONGE_WIDTH, n), dtype=jnp.uint64)
    for i in range(0, width, SPONGE_RATE):
        chunk = cols[i : i + SPONGE_RATE]
        c = chunk.shape[0]
        state = jnp.concatenate([chunk, state[c:]], axis=0)
        state = ps.permute_dev_sm(state)
    return state[:4]


def compress_halves_dev(digests: jax.Array) -> jax.Array:
    """[4, 2m] natural-order digests -> [4, m] parents, pairing (j, j+m).

    In the natural-order layout the reference's bit-rev-adjacent pair
    (2i, 2i+1) is exactly (first half, second half): rev_n(2i)=rev_{n-1}(i),
    rev_n(2i+1)=rev_{n-1}(i)+2^{n-1} — so every level is two contiguous
    slices, no gather (reference hash/merkle_tree.rs:50-57 keeps the
    interleaved rev-order layout instead)."""
    from plonky2_tpu.ops import pallas_poseidon as _pp

    m = digests.shape[1] // 2
    pairs = jnp.concatenate([digests[:, :m], digests[:, m:]], axis=0)  # [8, m]
    if _pp.should_use(m, 8):
        return _pp.sponge_pallas(pairs, interpret=_pp._INTERPRET)
    state = jnp.concatenate(
        [pairs, jnp.zeros((SPONGE_WIDTH - 8, m), dtype=jnp.uint64)], axis=0
    )
    return ps.permute_dev_sm(state)[:4]


@persistent_jit(static_argnums=(1,))
def _build_natural_jit(cols, cap_height):
    n = cols.shape[1]
    lg_n = n.bit_length() - 1
    layers = [hash_leaf_cols_dev(cols)]
    for _ in range(lg_n - cap_height):
        layers.append(compress_halves_dev(layers[-1]))
    return layers


def merkle_layers_dev(leaves: jax.Array, cap_height: int) -> list[jax.Array]:
    """All digest layers from leaf digests down to the cap (inclusive)."""
    n = leaves.shape[0]
    lg_n = n.bit_length() - 1
    assert 1 << lg_n == n, "leaf count must be a power of two"
    assert cap_height <= lg_n
    layers = [hash_leaves_dev(leaves)]
    for _ in range(lg_n - cap_height):
        layers.append(compress_layer_dev(layers[-1]))
    return layers


@dataclass
class MerkleProof:
    """Siblings from leaf-digest level up to (excluding) the cap level."""

    siblings: list[list[int]]  # each a 4-felt digest


class MerkleTree:
    """Host handle over device-built digest layers.

    leaves: [n, width] u64 array (device or numpy).
    """

    def __init__(self, leaves, cap_height: int = 0):
        leaves = jnp.asarray(np.asarray(leaves, dtype=np.uint64))
        self.leaves = leaves
        self.cap_height = cap_height
        # Layers stay on device (a full-layer fetch costs seconds over the
        # axon tunnel); the cap is fetched LAZILY — the fused prove path
        # never touches it on host (caps ride the single FRI fetch). Queries
        # go through open_many (one batched device gather); leaf()/prove()
        # are lazy-fetch fallbacks.
        self._layers_dev = _build_jit(leaves, cap_height)
        self._layers_host = None
        self._cap_host = None

    @property
    def cap(self):
        if self._cap_host is None:
            self._cap_host = [[int(v) for v in row]
                              for row in np.asarray(self._layers_dev[-1])]
        return self._cap_host

    @property
    def cap_dev(self):
        """Device cap layer, row-major [2^cap_height, 4] reference order."""
        return self._layers_dev[-1]

    @property
    def _layers(self):
        if self._layers_host is None:
            self._layers_host = [np.asarray(l) for l in self._layers_dev]
        return self._layers_host

    @property
    def num_leaves(self) -> int:
        return int(self.leaves.shape[0])

    def prove(self, leaf_index: int) -> MerkleProof:
        siblings = []
        idx = leaf_index
        for layer in self._layers[:-1]:
            siblings.append([int(v) for v in layer[idx ^ 1]])
            idx >>= 1
        return MerkleProof(siblings)

    def leaf(self, leaf_index: int) -> list[int]:
        return [int(v) for v in np.asarray(self.leaves[leaf_index])]

    def open_many_dev(self, indices: list[int]):
        """Device-side batched query gather -> (leaves [q, w], sibs
        [q, levels, 4]) WITHOUT fetching (callers pack several trees'
        openings into one transfer)."""
        levels = len(self._layers_dev) - 1
        q = len(indices)
        leaf_idx = np.asarray(indices, dtype=np.int32)
        sib_idx = np.asarray(
            [[(i >> k) ^ 1 for k in range(levels)] for i in indices],
            dtype=np.int32).reshape(q, levels)
        return _gather_openings_rows(
            self.leaves, tuple(self._layers_dev[:-1]),
            jnp.asarray(leaf_idx), jnp.asarray(sib_idx))

    def open_many(self, indices: list[int]) -> list[tuple[list[int], MerkleProof]]:
        """Batched (leaf, proof) extraction: ONE device gather + two host
        fetches for all queries (vs one tunnel round-trip per array access)."""
        leaves, sibs = self.open_many_dev(indices)
        levels = len(self._layers_dev) - 1
        leaves = np.asarray(leaves)          # [q, width]
        sibs = np.asarray(sibs)              # [q, levels, 4]
        return [
            ([int(v) for v in leaves[qi]],
             MerkleProof([[int(v) for v in sibs[qi, k]] for k in range(levels)]))
            for qi in range(len(indices))
        ]


@persistent_jit(static_argnums=(1,))
def _build_jit(leaves, cap_height):
    return merkle_layers_dev(leaves, cap_height)


@persistent_jit
def _gather_openings_rows(leaves, layers, leaf_idx, sib_idx):
    """Row-major gather: leaves [n, width] rows at leaf_idx [q]; per level k
    digests layers[k] [m, 4] at sib_idx [q, levels] -> sibs [q, levels, 4]."""
    out_leaves = jnp.take(leaves, leaf_idx, axis=0)
    sibs = [jnp.take(layer, sib_idx[:, k], axis=0)
            for k, layer in enumerate(layers)]
    return out_leaves, (jnp.stack(sibs, axis=1) if sibs
                        else jnp.zeros((leaf_idx.shape[0], 0, 4), jnp.uint64))


def _rev_bits_dev(x, bits: int):
    """Bit-reverse each element of an int32 array within `bits` bits."""
    r = jnp.zeros_like(x)
    for k in range(bits):
        r = (r << 1) | ((x >> k) & 1)
    return r


@persistent_jit(static_argnums=(3,))
def _gather_openings_rows_ref(leaves, layers, idx, shift_bits):
    """Row-major gather driven by DEVICE reference indices (u64 [q]):
    leaf index = idx >> shift_bits; sibling index per level k = (i >> k) ^ 1.
    Avoids a device->host fetch of the indices (they may be outputs of a
    fused program, e.g. FRI query challenges)."""
    i = (idx >> np.uint64(shift_bits)).astype(jnp.int32)
    out_leaves = jnp.take(leaves, i, axis=0)
    sibs = [jnp.take(layer, (i >> k) ^ 1, axis=0)
            for k, layer in enumerate(layers)]
    return out_leaves, (jnp.stack(sibs, axis=1) if sibs
                        else jnp.zeros((i.shape[0], 0, 4), jnp.uint64))


@persistent_jit(static_argnums=(3,))
def _gather_openings_cols_ref(cols, layers, idx, static):
    """Column-major (natural-order) gather driven by DEVICE reference
    indices; static = (lg_n, shift_bits). Index remapping ref->natural
    (bit reversal per level) happens on device."""
    lg_n, shift_bits = static
    i = (idx >> np.uint64(shift_bits)).astype(jnp.int32)
    out_leaves = jnp.take(cols, _rev_bits_dev(i, lg_n), axis=1).T
    sibs = [jnp.take(layer, _rev_bits_dev((i >> k) ^ 1, lg_n - k), axis=1).T
            for k, layer in enumerate(layers)]
    return out_leaves, (jnp.stack(sibs, axis=1) if sibs
                        else jnp.zeros((i.shape[0], 0, 4), jnp.uint64))


@persistent_jit
def _gather_openings_cols(cols, layers, leaf_idx, sib_idx):
    """Column-major gather: cols [width, n] at leaf_idx [q]; per level k
    digests layers[k] [4, m] at sib_idx [q, levels] -> sibs [q, levels, 4]."""
    out_leaves = jnp.take(cols, leaf_idx, axis=1).T
    sibs = [jnp.take(layer, sib_idx[:, k], axis=1).T
            for k, layer in enumerate(layers)]
    return out_leaves, (jnp.stack(sibs, axis=1) if sibs
                        else jnp.zeros((leaf_idx.shape[0], 0, 4), jnp.uint64))


class NaturalMerkleTree:
    """Merkle-cap tree over NATURAL-ORDER columns — same commitment as
    `MerkleTree` over the bit-reversed row-major leaves, but built with zero
    device-side data movement: leaves are the LDE's native [width, N] layout
    and every level pairs contiguous halves (`compress_halves_dev`).

    Level-k invariant: ref_digest_k[i] == layers[k][:, rev_{lgn-k}(i)], so
    `cap`/`prove`/`leaf` remap indices host-side (a few integer bit
    reversals per query) and present the reference's exact interface.
    """

    def __init__(self, cols, cap_height: int = 0):
        cols = jnp.asarray(cols)
        self.cap_height = cap_height
        n = int(cols.shape[1])
        self._lg_n = n.bit_length() - 1
        assert 1 << self._lg_n == n, "leaf count must be a power of two"
        assert cap_height <= self._lg_n
        # Layers and leaf columns stay on device (a full-layer fetch costs
        # seconds over the axon tunnel); the cap is fetched LAZILY so the
        # fused prove path pays no per-commitment round trip.
        self._layers_dev = _build_natural_jit(cols, cap_height)
        self._cols = None  # host cache; [width, n] natural order
        self._cols_dev = cols
        self._layers_host = None
        self._cap_host = None

    @property
    def cap(self):
        if self._cap_host is None:
            cap_nat = np.asarray(self._layers_dev[-1])
            self._cap_host = [
                [int(v) for v in cap_nat[:, reverse_bits(c, self.cap_height)]]
                for c in range(1 << self.cap_height)
            ]
        return self._cap_host

    @property
    def cap_dev(self):
        """Device cap layer in the NATURAL layout [4, 2^cap_height]
        (reference digest row c = column rev(c))."""
        return self._layers_dev[-1]

    @property
    def _layers(self):
        if self._layers_host is None:
            self._layers_host = [np.asarray(l) for l in self._layers_dev]
        return self._layers_host

    @property
    def num_leaves(self) -> int:
        return 1 << self._lg_n

    def _host_cols(self):
        if self._cols is None:
            self._cols = np.asarray(self._cols_dev)
        return self._cols

    def leaf(self, leaf_index: int) -> list[int]:
        j = reverse_bits(leaf_index, self._lg_n)
        return [int(v) for v in self._host_cols()[:, j]]

    def prove(self, leaf_index: int) -> MerkleProof:
        siblings = []
        for k in range(self._lg_n - self.cap_height):
            sib_ref = (leaf_index >> k) ^ 1
            j = reverse_bits(sib_ref, self._lg_n - k)
            siblings.append([int(v) for v in self._layers[k][:, j]])
        return MerkleProof(siblings)

    def open_many_dev(self, indices: list[int]):
        """Device-side batched query gather -> (leaves [q, w], sibs
        [q, levels, 4]) without fetching. Index remapping ref->natural
        happens here on host integers."""
        levels = self._lg_n - self.cap_height
        q = len(indices)
        leaf_idx = np.asarray(
            [reverse_bits(i, self._lg_n) for i in indices], dtype=np.int32)
        sib_idx = np.asarray(
            [[reverse_bits((i >> k) ^ 1, self._lg_n - k) for k in range(levels)]
             for i in indices], dtype=np.int32).reshape(q, levels)
        return _gather_openings_cols(
            self._cols_dev, tuple(self._layers_dev[:-1]),
            jnp.asarray(leaf_idx), jnp.asarray(sib_idx))

    def open_many(self, indices: list[int]) -> list[tuple[list[int], MerkleProof]]:
        """Batched (leaf, proof) extraction: ONE device gather + two host
        fetches for all queries."""
        levels = self._lg_n - self.cap_height
        leaves, sibs = self.open_many_dev(indices)
        leaves = np.asarray(leaves)          # [q, width]
        sibs = np.asarray(sibs)              # [q, levels, 4]
        return [
            ([int(v) for v in leaves[qi]],
             MerkleProof([[int(v) for v in sibs[qi, k]] for k in range(levels)]))
            for qi in range(len(indices))
        ]


# ---------------------------------------------------------------------------
# Host-side verification (scalar) — used by the FRI/native verifier.
# ---------------------------------------------------------------------------

def verify_merkle_proof_to_cap(
    leaf: list[int], leaf_index: int, cap: list, proof: MerkleProof, hasher=None
) -> None:
    """Raise if the proof is invalid (reference hash/merkle_proofs.rs)."""
    if hasher is None:
        from plonky2_tpu.hash.hashers import PoseidonHasher

        hasher = PoseidonHasher
    digest = hasher.hash_or_noop(leaf)
    idx = leaf_index
    for sibling in proof.siblings:
        if idx & 1:
            digest = hasher.two_to_one(sibling, digest)
        else:
            digest = hasher.two_to_one(digest, sibling)
        idx >>= 1
    expected = cap[idx] if isinstance(cap[idx], (bytes, bytearray)) else list(cap[idx])
    if digest != expected:
        raise ValueError(
            f"Merkle proof invalid: leaf {leaf_index} digest != cap[{idx}]"
        )


class KeccakMerkleTree:
    """Host Merkle-cap tree over byte digests, batch-hashed with the
    numpy-vectorized keccak (non-algebraic configs, reference
    KeccakGoldilocksConfig). Same interface as MerkleTree."""

    def __init__(self, leaves, cap_height: int = 0):
        import numpy as _np

        from plonky2_tpu.hash.hashers import KeccakHasher

        leaves = _np.asarray(leaves, dtype=_np.uint64)
        self.leaves = leaves
        self.cap_height = cap_height
        n = leaves.shape[0]
        lg_n = n.bit_length() - 1
        assert 1 << lg_n == n
        layers = [KeccakHasher.hash_leaves_batch(leaves)]
        for _ in range(lg_n - cap_height):
            layers.append(KeccakHasher.compress_batch(layers[-1]))
        self._layers = layers
        self.cap = [bytes(row) for row in layers[-1]]

    @property
    def num_leaves(self) -> int:
        return int(self.leaves.shape[0])

    def prove(self, leaf_index: int) -> MerkleProof:
        siblings = []
        idx = leaf_index
        for layer in self._layers[:-1]:
            siblings.append(bytes(layer[idx ^ 1]))
            idx >>= 1
        return MerkleProof(siblings)

    def leaf(self, leaf_index: int) -> list[int]:
        import numpy as _np

        return [int(v) for v in _np.asarray(self.leaves[leaf_index])]


def merkle_tree_from_device(leaves, layers, cap_height: int, cap_host) -> MerkleTree:
    """Wrap precomputed device layers (e.g. produced inside a larger fused
    program) as a MerkleTree without rebuilding or refetching; `cap_host` is
    the already-fetched reference-order cap."""
    t = MerkleTree.__new__(MerkleTree)
    t.leaves = leaves
    t.cap_height = cap_height
    t._layers_dev = list(layers)
    t._layers_host = None
    t._cap_host = cap_host
    return t


def make_merkle_tree(leaves, cap_height: int, hasher=None):
    from plonky2_tpu.hash.hashers import PoseidonHasher

    if hasher is None or hasher is PoseidonHasher or getattr(hasher, "algebraic", False):
        return MerkleTree(leaves, cap_height)
    import numpy as _np

    return KeccakMerkleTree(_np.asarray(leaves), cap_height)


class BatchMerkleTree:
    """One Merkle-cap tree over matrices of different heights: taller
    matrices sit lower; each shorter matrix's rows are concatenated onto the
    running cap digests (reference hash/batch_merkle_tree.rs:17-165).
    Layer hashing is device-batched Poseidon."""

    def __init__(self, leaves: list, cap_height: int):
        import numpy as _np

        assert leaves, "need at least one matrix"
        mats = [jnp.asarray(_np.asarray(m, dtype=_np.uint64)) for m in leaves]
        heights = [int(m.shape[0]).bit_length() - 1 for m in mats]
        assert all(1 << h == m.shape[0] for h, m in zip(heights, mats))
        assert all(heights[i] > heights[i + 1] for i in range(len(heights) - 1))
        assert cap_height <= heights[-1]

        self._mats_dev = mats
        self._leaves_host: list | None = None
        self.leaf_heights = heights
        self._layers_dev: list[list] = []  # per segment: digest layers (device)
        self._level_layers_host: list[list] | None = None

        cap = hash_leaves_dev(mats[0])
        for k in range(len(mats)):
            next_height = heights[k + 1] if k + 1 < len(mats) else cap_height
            if k > 0:
                combined = jnp.concatenate([cap, mats[k]], axis=1)
                cap = hash_leaves_dev(combined)
            layers = [cap]
            cur_height = heights[k]
            while cur_height > next_height:
                layers.append(compress_layer_dev(layers[-1]))
                cur_height -= 1
            self._layers_dev.append(layers)
            cap = layers[-1]

        # only the cap is fetched eagerly (full layers cost seconds over the
        # axon tunnel; queries use open_batch_many's single batched gather)
        self.cap = [[int(v) for v in row] for row in np.asarray(cap)]

    @property
    def leaves(self) -> list:
        if self._leaves_host is None:
            self._leaves_host = [np.asarray(m) for m in self._mats_dev]
        return self._leaves_host

    @property
    def _level_layers(self) -> list[list]:
        if self._level_layers_host is None:
            self._level_layers_host = [
                [np.asarray(l) for l in layers] for layers in self._layers_dev
            ]
        return self._level_layers_host

    def values(self, leaf_index: int) -> list[list[int]]:
        top = self.leaf_heights[0]
        return [
            [int(v) for v in m[leaf_index >> (top - h)]]
            for m, h in zip(self.leaves, self.leaf_heights)
        ]

    def open_batch(self, leaf_index: int) -> MerkleProof:
        top = self.leaf_heights[0]
        siblings = []
        for k, layers in enumerate(self._level_layers):
            idx = leaf_index >> (top - self.leaf_heights[k])
            for layer in layers[:-1]:
                siblings.append([int(v) for v in layer[idx ^ 1]])
                idx >>= 1
        return MerkleProof(siblings)

    def open_batch_many(self, indices: list[int]):
        """Batched (values, proof) extraction for all queries: one device
        gather per matrix plus ONE stacked gather+fetch for every sibling
        level (per-index host walks cost a tunnel round-trip per access)."""
        top = self.leaf_heights[0]
        q = len(indices)

        val_dev = []
        for m_dev, h in zip(self._mats_dev, self.leaf_heights):
            idx = jnp.asarray(
                np.asarray([i >> (top - h) for i in indices], np.int32))
            val_dev.append(jnp.take(m_dev, idx, axis=0))

        sib_dev = []
        for k, layers in enumerate(self._layers_dev):
            idxs = [i >> (top - self.leaf_heights[k]) for i in indices]
            for layer in layers[:-1]:
                sidx = jnp.asarray(
                    np.asarray([ix ^ 1 for ix in idxs], np.int32))
                sib_dev.append(jnp.take(layer, sidx, axis=0))
                idxs = [ix >> 1 for ix in idxs]
        sibs = (np.asarray(jnp.stack(sib_dev, axis=1)) if sib_dev
                else np.zeros((q, 0, 4), np.uint64))  # [q, levels, 4]
        vals = [np.asarray(v) for v in val_dev]

        out = []
        for qi in range(q):
            flat = [int(v) for m in vals for v in m[qi]]
            proof = MerkleProof(
                [[int(v) for v in sibs[qi, l]] for l in range(sibs.shape[1])])
            out.append((flat, proof))
        return out


def verify_batch_merkle_proof_to_cap(leaf_data: list, leaf_heights: list,
                                     leaf_index: int, cap, proof: MerkleProof,
                                     hasher=None) -> None:
    """reference hash/merkle_proofs.rs:72-110."""
    if hasher is None:
        from plonky2_tpu.hash.hashers import PoseidonHasher

        hasher = PoseidonHasher
    assert len(leaf_data) == len(leaf_heights)
    current = hasher.hash_or_noop(leaf_data[0])
    current_height = leaf_heights[0]
    data_index = 1
    for sibling in proof.siblings:
        bit = leaf_index & 1
        leaf_index >>= 1
        if bit:
            current = hasher.two_to_one(sibling, current)
        else:
            current = hasher.two_to_one(current, sibling)
        current_height -= 1
        if data_index < len(leaf_heights) and current_height == leaf_heights[data_index]:
            current = hasher.hash_or_noop(list(current) + list(leaf_data[data_index]))
            data_index += 1
    expected = cap[leaf_index]
    if list(current) != list(expected):
        raise ValueError("Batch Merkle proof invalid")
