"""Multi-chip sharding for the prover's bulk phases.

The reference's only parallelism is rayon shared-memory threads
(maybe_rayon/src/lib.rs) — there is no distributed backend to translate.
The TPU-native design (SURVEY.md §2.7, §5): lay out polynomials as
[num_polys, n] and pick shardings per phase over a 1-D device mesh:

  - NTT / LDE:  shard the POLY axis — each chip runs full NTTs for its
    columns with zero communication (per-polynomial data parallelism,
    reference fri/oracle.rs:66,125-138 rayon par_iter dual).
  - Merkle leaves: leaves are rows [N, num_polys]; resharding from
    poly-sharded to row-sharded is one all-to-all that XLA inserts from the
    output sharding constraint (the reference's transpose, fri/oracle.rs:97).
  - Merkle layers: row-sharded layer hashing is local until the layer width
    reaches the device count; the last log2(n_dev) levels ride an
    all-gather of 16 * 4 felts (cap_height=4) — negligible.
  - Round 2 scans / quotient eval: row (evaluation-point) sharded;
    associative scans over the row axis lower to XLA's sharded scan.
"""

from __future__ import annotations

import logging
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_log = logging.getLogger("plonky2_tpu.parallel")

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import ntt
from plonky2_tpu.hash import merkle


def make_mesh(n_devices: int | None = None, axis: str = "rows") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


# -- active-mesh context ------------------------------------------------------
#
# The prover's device programs are ordinary jits; multi-chip execution works
# by placing their INPUTS with named shardings (GSPMD then propagates layouts
# and inserts collectives). `use_mesh` activates a mesh; the shard_* helpers
# are no-ops without one, so the single-chip path is untouched.

_ACTIVE_MESH: list[Mesh] = []


class use_mesh:
    """Context manager: run prover phases sharded over `mesh`."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self):
        _ACTIVE_MESH.append(self.mesh)
        return self.mesh

    def __exit__(self, *exc):
        _ACTIVE_MESH.pop()
        return False


def active_mesh() -> Mesh | None:
    return _ACTIVE_MESH[-1] if _ACTIVE_MESH else None


def _shard(x, spec):
    """Commit x to the active mesh with `spec`. Uneven axis sizes are fine
    (GSPMD pads internally). If placement fails for any reason the array is
    REPLICATED onto the mesh — never left with an inconsistent placement —
    and the fallback is logged (a silently unplaced array is how mixed
    device commitments crash downstream jits)."""
    mesh = active_mesh()
    if mesh is None:
        return x
    x = jnp.asarray(x)
    try:
        return jax.device_put(x, NamedSharding(mesh, spec))
    except Exception as e:  # pragma: no cover - defensive
        _log.warning("mesh placement %s for shape %s failed (%s); replicating",
                     spec, x.shape, e)
        return jax.device_put(x, NamedSharding(mesh, P()))


def replicate(x):
    """Commit x to the active mesh fully replicated (no-op without a mesh).
    Use for small arrays that mix with sharded ones in a single program."""
    return _shard(x, P())


def shard_polys(x):
    """[num_polys, n]: shard the polynomial axis (per-poly data parallel —
    the reference's rayon par_iter over columns, fri/oracle.rs:66)."""
    mesh = active_mesh()
    if mesh is None:
        return x
    return _shard(x, P(mesh.axis_names[0], *([None] * (jnp.ndim(x) - 1))))


def pad_shard_polys(x):
    """[num_polys, n] -> (poly-sharded array padded with zero rows to a mesh
    multiple, original num_polys). IFFT/LDE are per-poly independent, so a
    zero-padded poly axis computes bit-identical results for the real rows;
    callers slice back to `orig` afterwards. This keeps the per-poly NTTs
    fully local on every device instead of replicating uneven batches
    (e.g. the standard config's 135 wire polynomials on an 8-device mesh)."""
    mesh = active_mesh()
    x = jnp.asarray(x)
    if mesh is None:
        return x, x.shape[0]
    n_dev = mesh.devices.size
    orig = x.shape[0]
    rem = orig % n_dev
    if rem:
        pad = jnp.zeros((n_dev - rem,) + x.shape[1:], dtype=x.dtype)
        x = jnp.concatenate([x, pad], axis=0)
    return shard_polys(x), orig


def shard_rows(x):
    """[n, ...]: shard the leading (row/evaluation-point) axis."""
    mesh = active_mesh()
    if mesh is None:
        return x
    return _shard(x, P(mesh.axis_names[0]))


def shard_lanes(x):
    """[..., n]: shard the trailing (evaluation-point) axis."""
    mesh = active_mesh()
    if mesh is None:
        return x
    spec = P(*([None] * (jnp.ndim(x) - 1) + [mesh.axis_names[0]]))
    return _shard(x, spec)


def sharded_commit(values, rate_bits: int, cap_height: int, mesh: Mesh):
    """Round-1 commitment pipeline under a mesh: poly-sharded NTT/LDE, one
    all-to-all into row-sharded leaves, local Merkle layers, gathered cap.

    Returns (coeffs [num_polys, n], leaves [N, num_polys], cap [2^cap, 4]).
    """
    poly_sharded = NamedSharding(mesh, P("rows", None))
    row_sharded = NamedSharding(mesh, P("rows", None))

    @partial(jax.jit, static_argnums=(1, 2))
    def run(vals, rate_bits, cap_height):
        coeffs = ntt.ifft(vals)  # local per poly (sharded on poly axis)
        lde = ntt.coset_lde(coeffs, rate_bits)  # [num_polys, N]
        n_lde = lde.shape[-1]
        lg = n_lde.bit_length() - 1
        leaves = jnp.swapaxes(lde, 0, 1)  # all-to-all via resharding
        leaves = jnp.take(leaves, jnp.asarray(ntt.bit_reverse_perm(lg)), axis=0)
        leaves = jax.lax.with_sharding_constraint(leaves, row_sharded)
        layers = merkle.merkle_layers_dev(leaves, cap_height)
        return coeffs, leaves, layers[-1]

    values = jax.device_put(jnp.asarray(values), poly_sharded)
    return run(values, rate_bits, cap_height)


def sharded_prover_step(mesh: Mesh, num_polys: int = 8, degree_bits: int = 6,
                        rate_bits: int = 3, cap_height: int = 2):
    """One representative multi-chip prover step on tiny shapes: sharded
    commit (NTT + all-to-all + Merkle) plus a row-sharded permutation-
    argument scan — the two communication patterns the full prover uses.
    Used by the driver's multi-chip dry run."""
    n = 1 << degree_bits
    rng = np.random.default_rng(0)
    values = rng.integers(0, 1 << 63, size=(num_polys, n), dtype=np.uint64)
    coeffs, leaves, cap = sharded_commit(values, rate_bits, cap_height, mesh)
    jax.block_until_ready(cap)

    # row-sharded modular prefix product (round-2 Z-polynomial pattern)
    row_sharded = NamedSharding(mesh, P("rows"))
    rows = jax.device_put(
        jnp.asarray(rng.integers(1, 1 << 63, size=(n,), dtype=np.uint64)), row_sharded
    )

    @jax.jit
    def scan_z(r):
        incl = jax.lax.associative_scan(g.mul, r)
        one = jnp.ones((1,), dtype=jnp.uint64)
        return jnp.concatenate([one, incl[:-1]])

    z = scan_z(rows)
    jax.block_until_ready(z)

    # quotient-evaluation pattern: point-sharded (lanes on rows) constraint
    # evaluation + alpha-reduction (local), then the coset iFFT whose
    # butterflies XLA turns into sharded collectives
    lane_sharded = NamedSharding(mesh, P(None, "rows"))
    lde = jax.device_put(
        jnp.asarray(rng.integers(0, 1 << 63, size=(num_polys, n << 1),
                                 dtype=np.uint64)), lane_sharded
    )
    alpha = np.uint64(7)

    @jax.jit
    def quotient(wires):
        # toy transition constraint per wire pair + alpha fold, like the
        # fused quotient program in plonk/prover.py
        c = g.mul(wires, jnp.roll(wires, -1, axis=1))
        acc = jnp.zeros((wires.shape[1],), dtype=jnp.uint64)
        for i in range(wires.shape[0]):
            acc = g.add(g.mul(acc, jnp.asarray(alpha)), c[i])
        return ntt.coset_ifft(acc[None, :])

    q = quotient(lde)
    jax.block_until_ready(q)
    return cap, z
