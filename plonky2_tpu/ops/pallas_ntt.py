"""Fused NTT butterfly kernel (Pallas/Mosaic).

`plonky2_tpu.field.ntt._butterflies0` runs lg_m DIT stages over axis 0 of a
[m, V] array. Under plain XLA each stage is a full HBM read+write; this kernel
keeps an [m, s, 128] tile resident in VMEM and runs ALL stages in one pass —
one HBM read and one HBM write per element — on u32 limb planes
(`plonky2_tpu.ops.goldilocks_limbs`, Mosaic has no u64).

Layout: the transform axis m lives entirely in leading "batch" dims of the
tile, so every stage's reshape/slice/concat is free address arithmetic; the
native (sublane, lane) tile is the (s, 128) minor block of the V axis, which
butterflies never touch. Twiddles arrive as a [m-1, 128] plane pair
(per-stage rows concatenated, pre-broadcast across lanes).

The reference reaches the same goal with in-cache recursive FFTs
(field/src/fft.rs); this is the TPU-native equivalent.
"""

from __future__ import annotations

import functools
import os

import numpy as np
import jax
import jax.numpy as jnp

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.ops.goldilocks_limbs import (
    gl_add,
    gl_mul,
    gl_sub,
    join_planes,
    split_planes,
)

_LANE = 128
# Full-height (8,128) tiles keep every vector register full; the unrolled
# stage chain's VMEM live set then needs the raised vmem_limit_bytes below.
# Measured on v5e, n=2^20 iNTT+LDE(x8) pipeline: s=8 70.6ms vs s=2 ~195ms
# vs pure-XLA 109.4ms.
_SUBLANES = int(os.environ.get("PLONKY2_TPU_PALLAS_SUBLANES", "8"))
_MIN_LG = 9
_MAX_LG = 11
# "auto": on when running on real TPU; "1": always (native); "0": never.
_FLAG = os.environ.get("PLONKY2_TPU_PALLAS", "auto")
# run the kernel in interpret mode (CPU testing of the integrated path)
_INTERPRET = False


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def should_use(lg_m: int, start_stage: int) -> bool:
    if _FLAG == "0" or start_stage != 0 or not (_MIN_LG <= lg_m <= _MAX_LG):
        return False
    if _FLAG == "1":
        return True
    return pallas_available()


@functools.lru_cache(maxsize=None)
def _twiddle_planes(lg_m: int) -> tuple[np.ndarray, np.ndarray]:
    """[m-1, 128] (lo, hi) planes: stage-s rows g_{2^s}^j, j < 2^(s-1)."""
    from plonky2_tpu.field import goldilocks as g

    rows = [g.np_powers(fs.primitive_root_of_unity(s), 1 << (s - 1))
            for s in range(1, lg_m + 1)]
    t = np.concatenate(rows)
    lo = np.repeat((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None], _LANE, 1)
    hi = np.repeat((t >> np.uint64(32)).astype(np.uint32)[:, None], _LANE, 1)
    return lo, hi


def _make_kernel(lg_m: int, s: int):
    m = 1 << lg_m

    def kernel(wlo_ref, whi_ref, vlo_ref, vhi_ref, olo_ref, ohi_ref):
        vlo = vlo_ref[...].reshape(m, s, _LANE)
        vhi = vhi_ref[...].reshape(m, s, _LANE)
        wlo = wlo_ref[...]
        whi = whi_ref[...]
        off = 0
        for st in range(1, lg_m + 1):
            half = 1 << (st - 1)
            nb = m >> st
            wl = wlo[off:off + half][None, :, None, :]  # [1, half, 1, 128]
            wh = whi[off:off + half][None, :, None, :]
            vvlo = vlo.reshape(nb, 2, half, s, _LANE)
            vvhi = vhi.reshape(nb, 2, half, s, _LANE)
            elo, ehi = vvlo[:, 0], vvhi[:, 0]
            dlo, dhi = vvlo[:, 1], vvhi[:, 1]
            tlo, thi = gl_mul(dlo, dhi, wl, wh)
            plo, phi = gl_add(elo, ehi, tlo, thi)
            mlo, mhi = gl_sub(elo, ehi, tlo, thi)
            vlo = jnp.concatenate([plo[:, None], mlo[:, None]], 1).reshape(m, s, _LANE)
            vhi = jnp.concatenate([phi[:, None], mhi[:, None]], 1).reshape(m, s, _LANE)
            off += half
        olo_ref[...] = vlo.reshape(m, 1, s, _LANE)
        ohi_ref[...] = vhi.reshape(m, 1, s, _LANE)

    return kernel


def butterflies0_pallas(v: jax.Array, lg_m: int, start_stage: int = 0,
                        interpret: bool = False, sublanes: int | None = None) -> jax.Array:
    """Drop-in for ntt._butterflies0 (start_stage=0): DIT stages over axis 0
    of [m, V...] u64 (input bit-reversed along axis 0)."""
    assert start_stage == 0
    import jax.experimental.pallas as pl

    m = 1 << lg_m
    assert v.shape[0] == m, (v.shape, m)
    rest = v.shape[1:]
    V = int(np.prod(rest)) if rest else 1
    s = sublanes or _SUBLANES
    blk = s * _LANE
    nV = -(-V // blk)
    pad = nV * blk - V

    x = v.reshape(m, V)
    if pad:
        x = jnp.pad(x, ((0, 0), (0, pad)))
    lo, hi = split_planes(x)
    lo = lo.reshape(m, nV, s, _LANE)
    hi = hi.reshape(m, nV, s, _LANE)
    wlo, whi = _twiddle_planes(lg_m)

    # x64 mode makes Python-int index components trace as i64, which Mosaic
    # cannot legalize — pin everything to i32.
    vspec = pl.BlockSpec(
        (m, 1, s, _LANE),
        lambda i: (np.int32(0), jnp.asarray(i, jnp.int32), np.int32(0), np.int32(0)),
    )
    wspec = pl.BlockSpec((m - 1, _LANE), lambda i: (np.int32(0), np.int32(0)))
    kwargs = {}
    if not interpret:
        from jax.experimental.pallas import tpu as pltpu

        # Mosaic's default scoped-vmem limit (16MB) is too small for the
        # unrolled stage chain's live set; v5e has 128MB VMEM.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        )
    olo, ohi = pl.pallas_call(
        _make_kernel(lg_m, s),
        grid=(nV,),
        in_specs=[wspec, wspec, vspec, vspec],
        out_specs=[vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((m, nV, s, _LANE), jnp.uint32)] * 2,
        interpret=interpret,
        **kwargs,
    )(jnp.asarray(wlo), jnp.asarray(whi), lo, hi)

    out = join_planes(olo, ohi).reshape(m, nV * blk)
    if pad:
        out = out[:, :V]
    return out.reshape((m,) + rest)
