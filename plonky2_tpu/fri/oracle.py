"""PolynomialBatch — the FRI commitment oracle (device-resident).

Reference: fri/oracle.rs:30-237. TPU-native pipeline: all column polynomials
are one [num_polys, n] array; IFFT -> zero-tail coset LDE -> transpose ->
bit-reversed leaf order -> layer-batched Poseidon Merkle tree, all jitted XLA.

`prove_openings` computes batch quotients by pointwise evaluation on the LDE
domain (batched extension inverse of (x - z)) + one iNTT, instead of the
reference's sequential synthetic division (polynomial/division.rs:75) — same
coefficients, no serial scan.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.util.export_cache import persistent_jit
from plonky2_tpu.field import ntt
from plonky2_tpu.field import scalar as fs
from plonky2_tpu.fri.prover import fri_proof
from plonky2_tpu.hash.merkle import NaturalMerkleTree, make_merkle_tree
from plonky2_tpu.util import reverse_bits

SALT_SIZE = 4


def _algebraic(hasher) -> bool:
    from plonky2_tpu.hash.hashers import PoseidonHasher

    return hasher is None or hasher is PoseidonHasher or getattr(
        hasher, "algebraic", False)


@persistent_jit(static_argnums=(1, 2))
def _values_to_lde_leaves(values, rate_bits, salt_size):
    """[num_polys, n] values -> (coeffs, lde [num_polys, N], leaves [N, num_polys])."""
    coeffs = ntt.ifft(values)
    lde, leaves = _coeffs_to_lde_leaves_impl(coeffs, rate_bits)
    return coeffs, lde, leaves


@persistent_jit(static_argnums=(1,))
def _coeffs_to_lde_leaves(coeffs, rate_bits):
    return _coeffs_to_lde_leaves_impl(coeffs, rate_bits)


def _coeffs_to_lde_leaves_impl(coeffs, rate_bits):
    lde = ntt.coset_lde(coeffs, rate_bits)  # [num_polys, N] natural order
    n_lde = lde.shape[-1]
    lg = n_lde.bit_length() - 1
    leaves = jnp.swapaxes(lde, 0, 1)  # [N, num_polys]
    return lde, jnp.take(leaves, jnp.asarray(ntt.bit_reverse_perm(lg)), axis=0)


@persistent_jit(static_argnums=(1,))
def _values_to_lde(values, rate_bits):
    coeffs = ntt.ifft(values)
    return coeffs, ntt.coset_lde(coeffs, rate_bits)


@persistent_jit(static_argnums=(1,))
def _coeffs_to_lde(coeffs, rate_bits):
    return ntt.coset_lde(coeffs, rate_bits)


class PolynomialBatch:
    """A batch of committed polynomials sharing one Merkle-cap tree."""

    def __init__(self, coeffs, lde, merkle_tree: MerkleTree, degree_log: int,
                 rate_bits: int, blinding: bool):
        self.polynomials = coeffs  # [num_polys, n] device coefficients
        self.lde = lde  # [num_polys, N] natural-order coset-LDE values
        self.merkle_tree = merkle_tree
        self.degree_log = degree_log
        self.rate_bits = rate_bits
        self.blinding = blinding

    @staticmethod
    def from_values(values, rate_bits: int, blinding: bool, cap_height: int,
                    hasher=None) -> "PolynomialBatch":
        from plonky2_tpu.parallel import pad_shard_polys

        # Under a mesh: zero-pad the poly axis to a device multiple so the
        # per-poly NTTs stay local (bit-identical for the real rows), then
        # slice back before committing leaves.
        if not isinstance(values, jax.Array):
            # host data -> one upload; device arrays (round-2/3 outputs) pass
            # through untouched — np.asarray on them would be a full
            # device->host->device round trip per commitment
            values = jnp.asarray(np.asarray(values, dtype=np.uint64))
        values, num_polys = pad_shard_polys(values)
        n = values.shape[-1]
        padded = num_polys != values.shape[0]
        if _algebraic(hasher):
            coeffs, lde = _values_to_lde(values, rate_bits)
            if padded:
                coeffs, lde = coeffs[:num_polys], lde[:num_polys]
            return PolynomialBatch._finish_natural(coeffs, lde, n, rate_bits,
                                                   blinding, cap_height)
        coeffs, lde, leaves = _values_to_lde_leaves(values, rate_bits, SALT_SIZE if blinding else 0)
        if padded:
            coeffs, lde, leaves = coeffs[:num_polys], lde[:num_polys], leaves[:, :num_polys]
        return PolynomialBatch._finish(coeffs, lde, leaves, n, rate_bits, blinding,
                                       cap_height, hasher)

    @staticmethod
    def from_coeffs(coeffs, rate_bits: int, blinding: bool, cap_height: int,
                    hasher=None) -> "PolynomialBatch":
        from plonky2_tpu.parallel import pad_shard_polys

        if not isinstance(coeffs, jax.Array):
            coeffs = jnp.asarray(np.asarray(coeffs, dtype=np.uint64))
        coeffs, num_polys = pad_shard_polys(coeffs)
        n = coeffs.shape[-1]
        padded = num_polys != coeffs.shape[0]
        if _algebraic(hasher):
            lde = _coeffs_to_lde(coeffs, rate_bits)
            if padded:
                coeffs, lde = coeffs[:num_polys], lde[:num_polys]
            return PolynomialBatch._finish_natural(coeffs, lde, n, rate_bits,
                                                   blinding, cap_height)
        lde, leaves = _coeffs_to_lde_leaves(coeffs, rate_bits)
        if padded:
            coeffs, lde, leaves = coeffs[:num_polys], lde[:num_polys], leaves[:, :num_polys]
        return PolynomialBatch._finish(coeffs, lde, leaves, n, rate_bits, blinding,
                                       cap_height, hasher)

    @staticmethod
    def _finish_natural(coeffs, lde, n, rate_bits, blinding, cap_height):
        """Commit straight off the LDE's natural [num_polys, N] layout —
        no transpose and no bit-reverse gather on device; NaturalMerkleTree
        presents reference-order cap/leaf/prove (reference fri/oracle.rs:82-112
        instead transposes + reverse_index_bits the whole LDE)."""
        cols = lde
        if blinding:
            # Salt rows are fresh randomness, not transcript-bound.
            from plonky2_tpu.util import rng

            salt = rng.field_matrix((SALT_SIZE, lde.shape[1]), fs.P)
            cols = jnp.concatenate([cols, jnp.asarray(salt)], axis=0)
        tree = NaturalMerkleTree(cols, cap_height)
        return PolynomialBatch(coeffs, lde, tree, n.bit_length() - 1, rate_bits,
                               blinding)

    @staticmethod
    def _finish(coeffs, lde, leaves, n, rate_bits, blinding, cap_height, hasher=None):
        if blinding:
            # Salt columns are fresh randomness, not transcript-bound.
            from plonky2_tpu.util import rng

            salt = rng.field_matrix((leaves.shape[0], SALT_SIZE), fs.P)
            leaves = jnp.concatenate([leaves, jnp.asarray(salt)], axis=1)
        tree = make_merkle_tree(leaves, cap_height, hasher)
        return PolynomialBatch(coeffs, lde, tree, n.bit_length() - 1, rate_bits, blinding)

    @property
    def lde_bits(self) -> int:
        return self.degree_log + self.rate_bits

    def get_lde_values(self, index: int, step: int = 1) -> list[int]:
        """Leaf values (salt stripped) at evaluation point index*step
        (reference fri/oracle.rs:142-151)."""
        idx = reverse_bits(index * step, self.lde_bits)
        leaf = self.merkle_tree.leaf(idx)
        return leaf[: len(leaf) - (SALT_SIZE if self.blinding else 0)]

    # -- batch opening proof ------------------------------------------------

    @staticmethod
    def prove_openings(instance, oracles, challenger, fri_params,
                       final_poly_coeff_len=None, max_num_query_steps=None, timing=None,
                       hasher=None):
        """Reference fri/oracle.rs:176-237; returns FriProof."""
        from plonky2_tpu.parallel import shard_lanes

        alpha = challenger.get_extension_challenge(2)

        rate_bits = fri_params.config.rate_bits
        n = 1 << fri_params.degree_bits

        # Under a mesh, oracles may carry DIFFERENT placements (the
        # constants/sigmas oracle is built at circuit-build time, outside any
        # mesh; prove-time oracles are mesh-sharded). Re-place every coeff
        # matrix with one uniform lane sharding before mixing rows across
        # oracles — jnp.stack over differently-committed arrays is an error.
        mats = [shard_lanes(o.polynomials) for o in oracles]

        # Device: accumulate final_poly over batches.
        final0 = jnp.zeros((n,), dtype=jnp.uint64)
        final1 = jnp.zeros((n,), dtype=jnp.uint64)
        for batch in instance.batches:
            polys = [mats[p.oracle_index][p.polynomial_index]
                     for p in batch.polynomials]
            num = len(polys)
            # stack rows from each oracle's coeff matrix: gather per oracle
            stacked = jnp.stack(polys)  # [num, n] base coefficients
            q0, q1 = _batch_quotient(
                stacked, g.to_field(list(alpha)), g.to_field(list(batch.point)), rate_bits
            )
            # final_poly = alpha^(batch size) * final_poly + quotient
            # (ReducingFactor::shift_poly semantics, reference util/reducing.rs:100)
            shift = fs.ext_exp(alpha, num)
            final0, final1 = g.ext2_add(
                _ext2_scalar_mul_arr(shift, (final0, final1)), (q0, q1))
        final_coeffs = (final0, final1)

        return fri_proof(
            [o.merkle_tree for o in oracles],
            final_coeffs,
            challenger,
            fri_params,
            final_poly_coeff_len=final_poly_coeff_len,
            max_num_query_steps=max_num_query_steps,
            hasher=hasher,
        )


def _ext2_scalar_mul_arr(c, a):
    """(ext scalar c) * (ext array a)."""
    c = (jnp.asarray(np.uint64(c[0])), jnp.asarray(np.uint64(c[1])))
    return g.ext2_mul(c, a)


@persistent_jit(static_argnums=(3,))
def _batch_quotient(polys, alpha, point, rate_bits):
    """Quotient (F(X) - F(z)) / (X - z) for F = sum_j alpha^j f_j.

    polys: [J, n] base coefficients; alpha, point: u64[2] ext scalars.
    Returns ext coeff arrays (q0, q1) of length n (degree <= n-1, top zero).
    """
    return _batch_quotient_impl(polys, (alpha[0], alpha[1]),
                                (point[0], point[1]), rate_bits)


def _batch_quotient_impl(polys, alpha, z, rate_bits):
    """Traceable body of `_batch_quotient` (alpha/z as 0-d scalar pairs)."""
    J, n = polys.shape

    # composition poly coeffs: comp = sum_j alpha^j * f_j   (ext coeffs)
    ap0, ap1 = g.ext2_powers(alpha, J)  # [J]
    comp0 = g.sum_mod(g.mul(polys, ap0[:, None]), axis=0)  # [n]
    comp1 = g.sum_mod(g.mul(polys, ap1[:, None]), axis=0)

    # F(z) via powers of z
    zp0, zp1 = g.ext2_powers(z, n)  # [n]
    terms = g.ext2_mul((comp0, comp1), (zp0, zp1))
    fz = g.ext2_sum_mod(terms, axis=0)  # ext scalar (0-d arrays)

    # evaluate comp on the LDE coset domain: two base LDEs
    ev0 = ntt.coset_lde(comp0, rate_bits)  # [N]
    ev1 = ntt.coset_lde(comp1, rate_bits)
    N = ev0.shape[0]
    lgN = N.bit_length() - 1
    # domain points x = g_mult * w^i (base field)
    root = fs.primitive_root_of_unity(lgN)
    xs = jnp.asarray(g.np_powers(root, N))
    xs = g.mul(xs, jnp.asarray(np.uint64(fs.MULTIPLICATIVE_GROUP_GENERATOR)))

    num0 = g.sub(ev0, fz[0])
    num1 = g.sub(ev1, fz[1])
    den = (g.sub(xs, jnp.asarray(z[0])), g.neg(jnp.broadcast_to(jnp.asarray(z[1]), xs.shape)))
    dinv = g.ext2_inverse(den)
    qv = g.ext2_mul((num0, num1), dinv)

    # back to coefficients; degree < n so tail is zero — truncate
    q0 = ntt.coset_ifft(qv[0])[:n]
    q1 = ntt.coset_ifft(qv[1])[:n]
    return q0, q1


def _ext2_pow_static(x, e: int):
    """x^e for device ext scalar pair x and STATIC exponent (square-multiply,
    unrolled at trace time)."""
    import jax.numpy as jnp

    acc = (jnp.uint64(1), jnp.uint64(0))
    for bit in bin(e)[2:]:
        acc = g.ext2_mul(acc, acc)
        if bit == "1":
            acc = g.ext2_mul(acc, x)
    return acc


