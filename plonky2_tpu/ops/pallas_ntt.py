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
    gl_mul_g4,
    gl_mul_pow2,
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
# Round-5: lowered 9 -> 6 after verifying bit-identity + speed on the real
# chip at prover sizes (degree 2^12 circuits four-step into lg_m = 6..8
# factors; the XLA butterfly path there cost ~3x in the warm-prove chain).
_MIN_LG = 6
# lg 11 tiles exceed v5e VMEM (measured on the inner-2^18 chain: the
# unrolled stage chain wants 154M of the 128M budget); those factors take
# the XLA butterfly path. The n=2^20 pipeline four-steps into lg 10+10 and
# is unaffected.
_MAX_LG = 10
# "auto": on when running on real TPU; "1": always (native); "0": never.
_FLAG = os.environ.get("PLONKY2_TPU_PALLAS", "auto")
# Stages 1..6 twiddles are powers of two (2 has order 192 mod p; the order-64
# subgroup = <8>), so their multiplies run as variable shifts + reduction
# (gl_mul_pow2) instead of 16 32x32 products. "0" disables.
_CHEAP_MAX = 6
_POW2 = os.environ.get("PLONKY2_TPU_PALLAS_POW2", "1") != "0"
# run the kernel in interpret mode (CPU testing of the integrated path)
_INTERPRET = False
# Fold the four-step mid bit-reversals into the kernels (static VMEM row
# permutations: the DIF phase un-reverses its output rows, the DIT phase
# bit-reverses its input rows) so the data movement between phases is a
# PURE transpose (ROOFLINE lever 2). "0" restores the XLA gathers.
_FOLD_BREV = os.environ.get("PLONKY2_TPU_PALLAS_FOLDBREV", "1") != "0"
# Fold the interleave/output epilogue transposes into the DIT out_specs
# (ROOFLINE lever 3): the DIT phase's column axis is order-free, so the mid
# transpose pre-permutes columns to the FINAL order and each kernel step
# block-writes its slab straight into the final layout — no post-DIT
# transpose at all. "0" restores the XLA epilogue transposes.
_FOLD_OUT = os.environ.get("PLONKY2_TPU_PALLAS_OUTFOLD", "1") != "0"


def pallas_available() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def enabled() -> bool:
    if _FLAG == "0":
        return False
    if _FLAG == "1":
        return True
    return pallas_available()


def should_use(lg_m: int, start_stage: int) -> bool:
    if start_stage != 0 or not (_MIN_LG <= lg_m <= _MAX_LG):
        return False
    return enabled()


@functools.lru_cache(maxsize=None)
def _twiddle_planes(lg_m: int, inverse: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """[m-1, 128] (lo, hi) planes: stage-s rows g_{2^s}^{±j}, j < 2^(s-1)."""
    from plonky2_tpu.field import goldilocks as g

    def root(s):
        r = fs.primitive_root_of_unity(s)
        return fs.inverse(r) if inverse else r

    rows = [g.np_powers(root(s), 1 << (s - 1))
            for s in range(1, lg_m + 1)]
    t = np.concatenate(rows)
    lo = np.repeat((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None], _LANE, 1)
    hi = np.repeat((t >> np.uint64(32)).astype(np.uint32)[:, None], _LANE, 1)
    return lo, hi


@functools.lru_cache(maxsize=None)
def _twiddle_exp_plane(inverse: bool = False) -> np.ndarray:
    """[63, 128] u32 exponent rows for stages 1.._CHEAP_MAX, laid out at the
    same offsets as `_twiddle_planes`: stage-s row j = dlog2(g_{2^s}^{±j})
    = ±j·(192 >> s) mod 192 (g_{2^s} = 2^{192 >> s} for s <= 6)."""
    rows = []
    for s in range(1, _CHEAP_MAX + 1):
        step = 192 >> s
        j = np.arange(1 << (s - 1), dtype=np.int64)
        e = (-j * step) % 192 if inverse else (j * step) % 192
        rows.append(e.astype(np.uint32))
    return np.repeat(np.concatenate(rows)[:, None], _LANE, 1)


@functools.lru_cache(maxsize=None)
def _cube_exp_plane(inverse: bool = False) -> np.ndarray:
    """[21, 128] u32 exponents of the cube rows for merged pairs sl in
    {1, 3, 5} (the `_cube_offsets` prefix): ±3j·(192 >> (sl+1)) mod 192."""
    rows = []
    for sl in (1, 3, 5):
        step = 192 >> (sl + 1)
        j = np.arange(1 << (sl - 1), dtype=np.int64)
        e = (-3 * j * step) % 192 if inverse else (3 * j * step) % 192
        rows.append(e.astype(np.uint32))
    return np.repeat(np.concatenate(rows)[:, None], _LANE, 1)


def _stage_plan(lg_m: int) -> tuple[list[int], int | None]:
    """Radix-4 pairing of DIT stages 1..lg_m: merged pairs (s, s+1) listed by
    their low stage (ascending), plus a lone radix-2 stage when lg_m is odd."""
    pairs = list(range(1, lg_m, 2)) if lg_m % 2 == 0 else list(range(1, lg_m - 1, 2))
    lone = None if lg_m % 2 == 0 else lg_m
    return pairs, lone


@functools.lru_cache(maxsize=None)
def _cube_offsets(lg_m: int) -> dict[int, int]:
    """Row offset of each merged pair's w'^3 rows in the cube twiddle table."""
    offs, cur = {}, 0
    for s in _stage_plan(lg_m)[0]:
        offs[s] = cur
        cur += 1 << (s - 1)
    return offs


def _cube_rows(lg_m: int) -> int:
    return sum(1 << (s - 1) for s in _stage_plan(lg_m)[0])


def _radix2_stage(lg_m, s, vlo, vhi, wlo, whi, st, dif, wexp=None):
    m = 1 << lg_m
    half = 1 << (st - 1)
    nb = m >> st
    off = half - 1  # stage-st twiddle rows live at [2^(st-1)-1, 2^st-1)
    cheap = wexp is not None and st <= _CHEAP_MAX
    if cheap:
        we = wexp[off:off + half][None, :, None, :]
        mul = lambda a, b: gl_mul_pow2(a, b, we)
    else:
        wl = wlo[off:off + half][None, :, None, :]  # [1, half, 1, 128]
        wh = whi[off:off + half][None, :, None, :]
        mul = lambda a, b: gl_mul(a, b, wl, wh)
    vvlo = vlo.reshape(nb, 2, half, s, _LANE)
    vvhi = vhi.reshape(nb, 2, half, s, _LANE)
    elo, ehi = vvlo[:, 0], vvhi[:, 0]
    dlo, dhi = vvlo[:, 1], vvhi[:, 1]
    if st == 1:
        # the half=1 stage's only twiddle is w_2^0 = 1 — pure add/sub
        plo, phi = gl_add(elo, ehi, dlo, dhi)
        mlo, mhi = gl_sub(elo, ehi, dlo, dhi)
    elif dif:
        plo, phi = gl_add(elo, ehi, dlo, dhi)
        slo, shi = gl_sub(elo, ehi, dlo, dhi)
        mlo, mhi = mul(slo, shi)
    else:
        tlo, thi = mul(dlo, dhi)
        plo, phi = gl_add(elo, ehi, tlo, thi)
        mlo, mhi = gl_sub(elo, ehi, tlo, thi)
    vlo = jnp.concatenate([plo[:, None], mlo[:, None]], 1).reshape(m, s, _LANE)
    vhi = jnp.concatenate([phi[:, None], mhi[:, None]], 1).reshape(m, s, _LANE)
    return vlo, vhi


def _stages(lg_m: int, s: int, vlo, vhi, wlo, whi, dif: bool,
            clo=None, chi=None, inverse: bool = False,
            wexp=None, cexp=None):
    """Unrolled butterfly network on a VMEM-resident [m, s, 128] plane pair.

    dif=False: DIT, stages ascending, bit-reversed input -> natural output,
               butterfly (e + w·o, e − w·o).
    dif=True:  the TRANSPOSED network (the DFT matrix is symmetric, and the
               bit-reversal is an involution, so F = P·B_1ᵀ…B_lgᵀ): stages
               descending, SAME per-stage twiddles, butterfly
               (x0 + x1, w·(x0 − x1)); natural input -> bit-reversed output.

    With cube planes (clo/chi: rows w'^3 per merged pair, `_cube_offsets`
    layout) consecutive stage pairs fuse into radix-4 blocks: 3 full
    twiddle muls + one shift-based ·g_4 per 4 elements instead of 4 full
    muls (w'^2 rows are the low stage's own rows, w' rows the first half of
    the high stage's — only the cubes need a new table). `inverse` flips the
    sign of g_4 (i^{-1} = -2^48) by swapping one subtraction's operands; the
    w-tables themselves are already inverse-root tables in that case.
    """
    if clo is None:
        order = range(lg_m, 0, -1) if dif else range(1, lg_m + 1)
        for st in order:
            vlo, vhi = _radix2_stage(lg_m, s, vlo, vhi, wlo, whi, st, dif,
                                     wexp)
        return vlo, vhi

    m = 1 << lg_m
    pairs, lone = _stage_plan(lg_m)
    offs = _cube_offsets(lg_m)

    if dif and lone is not None:
        vlo, vhi = _radix2_stage(lg_m, s, vlo, vhi, wlo, whi, lone, dif, wexp)

    for sl in (reversed(pairs) if dif else pairs):
        h = 1 << (sl - 1)
        nb = m >> (sl + 1)
        wo = (1 << sl) - 1  # stage sl+1 rows: w'^j, first h of 2^sl entries
        w2o = h - 1  # stage sl rows: w'^2j
        co = offs[sl]
        cheap = wexp is not None and sl + 1 <= _CHEAP_MAX
        if cheap:
            we1 = wexp[wo:wo + h][None, :, None, :]
            we2 = wexp[w2o:w2o + h][None, :, None, :]
            we3 = cexp[co:co + h][None, :, None, :]
            mul1 = lambda a, b: gl_mul_pow2(a, b, we1)
            mul2 = lambda a, b: gl_mul_pow2(a, b, we2)
            mul3 = lambda a, b: gl_mul_pow2(a, b, we3)
        else:
            w1l = wlo[wo:wo + h][None, :, None, :]
            w1h = whi[wo:wo + h][None, :, None, :]
            w2l = wlo[w2o:w2o + h][None, :, None, :]
            w2h = whi[w2o:w2o + h][None, :, None, :]
            w3l = clo[co:co + h][None, :, None, :]
            w3h = chi[co:co + h][None, :, None, :]
            mul1 = lambda a, b: gl_mul(a, b, w1l, w1h)
            mul2 = lambda a, b: gl_mul(a, b, w2l, w2h)
            mul3 = lambda a, b: gl_mul(a, b, w3l, w3h)
        vvlo = vlo.reshape(nb, 4, h, s, _LANE)
        vvhi = vhi.reshape(nb, 4, h, s, _LANE)
        x = [(vvlo[:, q], vvhi[:, q]) for q in range(4)]
        if not dif:
            # DIT block: t1 = w'^2·x1; A = w'·x2; B = w'^3·x3
            if sl == 1:
                t1, A, B = x[1], x[2], x[3]
            else:
                t1 = mul2(*x[1])
                A = mul1(*x[2])
                B = mul3(*x[3])
            y0 = gl_add(*x[0], *t1)
            y1 = gl_sub(*x[0], *t1)
            u2 = gl_add(*A, *B)
            ab = gl_sub(*B, *A) if inverse else gl_sub(*A, *B)
            u3 = gl_mul_g4(*ab)
            z = [gl_add(*y0, *u2), gl_add(*y1, *u3),
                 gl_sub(*y0, *u2), gl_sub(*y1, *u3)]
        else:
            # transposed block: 4-point DFT then twiddles w'^2, w', w'^3
            c0 = gl_add(*x[0], *x[2])
            c1 = gl_add(*x[1], *x[3])
            d0 = gl_sub(*x[0], *x[2])
            d1 = gl_sub(*x[1], *x[3])
            e = gl_mul_g4(*d1)
            p2 = gl_sub(*d0, *e) if inverse else gl_add(*d0, *e)
            p3 = gl_add(*d0, *e) if inverse else gl_sub(*d0, *e)
            z0 = gl_add(*c0, *c1)
            z1 = gl_sub(*c0, *c1)
            if sl != 1:
                z1 = mul2(*z1)
                p2 = mul1(*p2)
                p3 = mul3(*p3)
            z = [z0, z1, p2, p3]
        vlo = jnp.concatenate([zl[:, None] for zl, _ in z], 1).reshape(m, s, _LANE)
        vhi = jnp.concatenate([zh[:, None] for _, zh in z], 1).reshape(m, s, _LANE)

    if not dif and lone is not None:
        vlo, vhi = _radix2_stage(lg_m, s, vlo, vhi, wlo, whi, lone, dif, wexp)
    return vlo, vhi


@functools.lru_cache(maxsize=None)
def _cube_planes(lg_m: int, inverse: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """[cube_rows, 128] (lo, hi) planes: per merged pair (s, s+1) the rows
    (g_{2^{s+1}}^{±1})^{3j}, j < 2^(s-1), at `_cube_offsets` offsets."""
    from plonky2_tpu.field import goldilocks as g

    rows = []
    for sl in _stage_plan(lg_m)[0]:
        r = fs.primitive_root_of_unity(sl + 1)
        if inverse:
            r = fs.inverse(r)
        rows.append(g.np_powers(fs.exp(r, 3), 1 << (sl - 1)))
    t = np.concatenate(rows)
    lo = np.repeat((t & np.uint64(0xFFFFFFFF)).astype(np.uint32)[:, None], _LANE, 1)
    hi = np.repeat((t >> np.uint64(32)).astype(np.uint32)[:, None], _LANE, 1)
    return lo, hi


def _brev_rows(v, lg_m: int):
    """Static bit-reversal of the leading (row) axis of a VMEM-resident
    array: reshape to lg_m binary axes, reverse their order, reshape back —
    pure address movement for Mosaic (rows are whole (sublane, lane) tiles),
    no gather."""
    m = 1 << lg_m
    rest = v.shape[1:]
    v = v.reshape((2,) * lg_m + rest)
    perm = tuple(range(lg_m - 1, -1, -1)) + tuple(range(lg_m, lg_m + len(rest)))
    return jnp.transpose(v, perm).reshape((m,) + rest)


def _make_kernel(lg_m: int, s: int, inverse: bool = False,
                 pre_brev: bool = False, out5: bool = False):
    m = 1 << lg_m

    def kernel(wlo_ref, whi_ref, clo_ref, chi_ref, we_ref, ce_ref,
               vlo_ref, vhi_ref, olo_ref, ohi_ref):
        vlo = vlo_ref[...].reshape(m, s, _LANE)
        vhi = vhi_ref[...].reshape(m, s, _LANE)
        if pre_brev:
            # natural-order input: bit-reverse rows in VMEM (the four-step
            # mid pass then needs no gather, just a transpose)
            vlo = _brev_rows(vlo, lg_m)
            vhi = _brev_rows(vhi, lg_m)
        vlo, vhi = _stages(
            lg_m, s, vlo, vhi,
            wlo_ref[...], whi_ref[...], dif=False,
            clo=clo_ref[...], chi=chi_ref[...], inverse=inverse,
            wexp=we_ref[...] if _POW2 else None,
            cexp=ce_ref[...] if _POW2 else None,
        )
        if out5:
            # final-layout block write ([rows, m, cols, s, LANE] out array)
            olo_ref[...] = vlo.reshape(1, m, 1, s, _LANE)
            ohi_ref[...] = vhi.reshape(1, m, 1, s, _LANE)
        else:
            olo_ref[...] = vlo.reshape(m, 1, s, _LANE)
            ohi_ref[...] = vhi.reshape(m, 1, s, _LANE)

    return kernel


def _make_dif_kernel(lg_m: int, s: int, with_scale: bool = False,
                     inverse: bool = False, unrev_out: bool = False):
    """Phase-1 four-step kernel: optional coset-scale prologue (interleaved
    LDE), DIF stages, fused four-step twiddle epilogue — operating directly
    on the natural [B, a, b] layout (no pre-transpose, no bit-reverse
    gather). unrev_out additionally un-bit-reverses the output rows in VMEM
    (the twiddle table must then be in NATURAL row order)."""
    m = 1 << lg_m

    def kernel(wlo_ref, whi_ref, clo_ref, chi_ref, we_ref, ce_ref,
               twlo_ref, twhi_ref, *rest):
        if with_scale:
            sclo_ref, schi_ref, vlo_ref, vhi_ref, olo_ref, ohi_ref = rest
        else:
            vlo_ref, vhi_ref, olo_ref, ohi_ref = rest
        vlo = vlo_ref[...].reshape(m, s, _LANE)
        vhi = vhi_ref[...].reshape(m, s, _LANE)
        if with_scale:
            vlo, vhi = gl_mul(vlo, vhi,
                              sclo_ref[...].reshape(m, s, _LANE),
                              schi_ref[...].reshape(m, s, _LANE))
        vlo, vhi = _stages(lg_m, s, vlo, vhi, wlo_ref[...], whi_ref[...],
                           dif=True, clo=clo_ref[...], chi=chi_ref[...],
                           inverse=inverse,
                           wexp=we_ref[...] if _POW2 else None,
                           cexp=ce_ref[...] if _POW2 else None)
        if unrev_out:
            vlo = _brev_rows(vlo, lg_m)
            vhi = _brev_rows(vhi, lg_m)
        twlo = twlo_ref[...].reshape(m, s, _LANE)
        twhi = twhi_ref[...].reshape(m, s, _LANE)
        vlo, vhi = gl_mul(vlo, vhi, twlo, twhi)
        olo_ref[...] = vlo.reshape(1, m, 1, s, _LANE)
        ohi_ref[...] = vhi.reshape(1, m, 1, s, _LANE)

    return kernel


def _sublanes_for(lg_m: int) -> int:
    # VMEM live set of the unrolled chain scales with m·s; keep it bounded.
    return {9: 8, 10: 8, 11: 4, 12: 2}.get(lg_m, _SUBLANES)


def _compile_kwargs(interpret: bool) -> dict:
    if interpret:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    # Mosaic's default scoped-vmem limit (16MB) is too small for the
    # unrolled stage chain's live set; v5e has 128MB VMEM.
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=110 * 1024 * 1024)}


# x64 mode makes Python-int index components trace as i64, which Mosaic
# cannot legalize — pin every index-map component to i32.
def _i32(x):
    return jnp.asarray(x, jnp.int32)


_Z = np.int32(0)


def _dit_planes(lo, hi, lg_m: int, s: int, interpret: bool,
                inverse: bool = False, pre_brev: bool = False,
                out_layout: tuple[int, int] | None = None):
    """DIT butterfly network on [m, nV, s, 128] planes -> same shape, or —
    with out_layout=(rows, cols_per_row) — straight into the FINAL
    [rows, m, cols_per_row, s, 128] layout: column chunk i block-writes to
    (i // cpr, :, i % cpr), so the caller's post-DIT transpose disappears
    (ROOFLINE lever 3). pre_brev: input rows are in NATURAL order; the
    kernel bit-reverses them in VMEM first."""
    import jax.experimental.pallas as pl

    m = 1 << lg_m
    nV = lo.shape[1]
    wlo, whi = _twiddle_planes(lg_m, inverse)
    clo, chi = _cube_planes(lg_m, inverse)
    we = _twiddle_exp_plane(inverse)
    ce = _cube_exp_plane(inverse)
    vspec = pl.BlockSpec((m, 1, s, _LANE), lambda i: (_Z, _i32(i), _Z, _Z))
    wspec = pl.BlockSpec((m - 1, _LANE), lambda i: (_Z, _Z))
    cspec = pl.BlockSpec((clo.shape[0], _LANE), lambda i: (_Z, _Z))
    wespec = pl.BlockSpec((we.shape[0], _LANE), lambda i: (_Z, _Z))
    cespec = pl.BlockSpec((ce.shape[0], _LANE), lambda i: (_Z, _Z))
    if out_layout is None:
        out_specs = [vspec, vspec]
        out_shape = [jax.ShapeDtypeStruct((m, nV, s, _LANE), jnp.uint32)] * 2
    else:
        rows, cpr = out_layout
        assert rows * cpr == nV, (rows, cpr, nV)
        rr = np.int32(cpr)
        ospec = pl.BlockSpec((1, m, 1, s, _LANE),
                             lambda i: (_i32(i) // rr, _Z, _i32(i) % rr, _Z, _Z))
        out_specs = [ospec, ospec]
        out_shape = [jax.ShapeDtypeStruct((rows, m, cpr, s, _LANE),
                                          jnp.uint32)] * 2
    return pl.pallas_call(
        _make_kernel(lg_m, s, inverse, pre_brev, out5=out_layout is not None),
        grid=(nV,),
        in_specs=[wspec, wspec, cspec, cspec, wespec, cespec, vspec, vspec],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
        **_compile_kwargs(interpret),
    )(jnp.asarray(wlo), jnp.asarray(whi), jnp.asarray(clo), jnp.asarray(chi),
      jnp.asarray(we), jnp.asarray(ce), lo, hi)


def butterflies0_pallas(v: jax.Array, lg_m: int, start_stage: int = 0,
                        interpret: bool = False, sublanes: int | None = None,
                        inverse: bool = False) -> jax.Array:
    """Drop-in for ntt._butterflies0 (start_stage=0): DIT stages over axis 0
    of [m, V...] u64 (input bit-reversed along axis 0)."""
    assert start_stage == 0
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
    olo, ohi = _dit_planes(lo.reshape(m, nV, s, _LANE), hi.reshape(m, nV, s, _LANE),
                           lg_m, s, interpret, inverse)
    out = join_planes(olo, ohi).reshape(m, nV * blk)
    if pad:
        out = out[:, :V]
    return out.reshape((m,) + rest)


@functools.lru_cache(maxsize=None)
def _four_step_twiddle_planes(lg_n: int, lg_a: int, inverse: bool = False,
                              natural: bool = False,
                              ) -> tuple[np.ndarray, np.ndarray]:
    """[a, b] four-step table W[k1, i2]; rows pre-permuted to the DIF output
    order (row r holds W[brev(r), ·]) unless `natural` (the fold-brev kernel
    un-reverses its rows BEFORE the twiddle mul); inverse folds in 1/n."""
    from plonky2_tpu.field.ntt import _four_step_twiddles, bit_reverse_perm

    t = _four_step_twiddles(lg_n, lg_a, inverse)
    if not natural:
        t = t[bit_reverse_perm(lg_a)]
    return ((t & np.uint64(0xFFFFFFFF)).astype(np.uint32),
            (t >> np.uint64(32)).astype(np.uint32))


def fourstep_supported(lg_n: int, B: int) -> bool:
    lg_a = (lg_n + 1) // 2
    lg_b = lg_n - lg_a
    # lg_a <= 10: the lg-11 DIF kernel's register spill slots alone need
    # 104M of the v5e's 128M VMEM (measured OOM on the inner-2^18 chain,
    # total 154M); larger factors fall back to the per-phase path.
    if not (9 <= lg_b <= lg_a <= 10):
        return False
    s1 = _sublanes_for(lg_a)
    s2 = _sublanes_for(lg_b)
    return ((1 << lg_b) % (s1 * _LANE) == 0
            and (B << lg_a) % (s2 * _LANE) == 0)


def fft_four_step_pallas(coeffs: jax.Array, interpret: bool = False,
                         interleave: int | None = None,
                         scale: jax.Array | None = None,
                         inverse: bool = False) -> jax.Array:
    """Bailey four-step NTT over the last axis, Pallas end-to-end: DIF phase
    directly on the natural [B, a, b] layout with the four-step twiddle fused
    as a kernel epilogue, ONE gather+transpose between phases, DIT phase, and
    u32 planes maintained throughout (one split, one join).

    Matches `field.ntt._fft_four_step` bit-for-bit. inverse=True runs the
    full inverse NTT in-network (inverted twiddles, 1/n folded into the mid
    twiddle table) — no reversal or scale pass.
    """
    import jax.experimental.pallas as pl

    from plonky2_tpu.field.ntt import bit_reverse_perm

    n = coeffs.shape[-1]
    lg_n = n.bit_length() - 1
    lg_a = (lg_n + 1) // 2
    a, b = 1 << lg_a, n >> lg_a
    lg_b = lg_n - lg_a
    batch = coeffs.shape[:-1]
    B0 = int(np.prod(batch)) if batch else 1
    R = 1 if scale is None else scale.shape[0]
    B = B0 * R  # with a scale table, each input row fans out to R cosets
    assert fourstep_supported(lg_n, B)
    if scale is None:
        assert interleave is None or batch[-1] == interleave
    else:
        assert interleave == R, "scale fan-out implies interleaved output"
    assert not (inverse and (scale is not None or interleave)), \
        "inverse NTT has no coset/interleave form"

    s1 = _sublanes_for(lg_a)
    blk1 = s1 * _LANE
    nbc = b // blk1
    lo, hi = split_planes(coeffs.reshape(B0, a, b))
    lo = lo.reshape(B0, a, nbc, s1, _LANE)
    hi = hi.reshape(B0, a, nbc, s1, _LANE)
    wlo, whi = _twiddle_planes(lg_a, inverse)
    clo, chi = _cube_planes(lg_a, inverse)
    we = _twiddle_exp_plane(inverse)
    ce = _cube_exp_plane(inverse)
    twlo, twhi = _four_step_twiddle_planes(lg_n, lg_a, inverse,
                                           natural=_FOLD_BREV)

    if scale is None:
        in_map = lambda iB, ic: (_i32(iB), _Z, _i32(ic), _Z, _Z)
    else:
        rr = np.int32(R)
        in_map = lambda iB, ic: (_i32(iB) // rr, _Z, _i32(ic), _Z, _Z)
    inspec = pl.BlockSpec((1, a, 1, s1, _LANE), in_map)
    ospec = pl.BlockSpec((1, a, 1, s1, _LANE),
                         lambda iB, ic: (_i32(iB), _Z, _i32(ic), _Z, _Z))
    wspec = pl.BlockSpec((a - 1, _LANE), lambda iB, ic: (_Z, _Z))
    cspec = pl.BlockSpec((clo.shape[0], _LANE), lambda iB, ic: (_Z, _Z))
    wespec = pl.BlockSpec((we.shape[0], _LANE), lambda iB, ic: (_Z, _Z))
    cespec = pl.BlockSpec((ce.shape[0], _LANE), lambda iB, ic: (_Z, _Z))
    twspec = pl.BlockSpec((a, 1, s1, _LANE),
                          lambda iB, ic: (_Z, _i32(ic), _Z, _Z))
    operands = [jnp.asarray(wlo), jnp.asarray(whi),
                jnp.asarray(clo), jnp.asarray(chi),
                jnp.asarray(we), jnp.asarray(ce),
                jnp.asarray(twlo).reshape(a, nbc, s1, _LANE),
                jnp.asarray(twhi).reshape(a, nbc, s1, _LANE)]
    in_specs = [wspec, wspec, cspec, cspec, wespec, cespec, twspec, twspec]
    if scale is not None:
        rr = np.int32(R)
        scspec = pl.BlockSpec(
            (1, a, 1, s1, _LANE),
            lambda iB, ic: (_i32(iB) % rr, _Z, _i32(ic), _Z, _Z),
        )
        sclo, schi = split_planes(jnp.asarray(scale))
        operands += [sclo.reshape(R, a, nbc, s1, _LANE),
                     schi.reshape(R, a, nbc, s1, _LANE)]
        in_specs += [scspec, scspec]
    lo, hi = pl.pallas_call(
        _make_dif_kernel(lg_a, s1, with_scale=scale is not None,
                         inverse=inverse, unrev_out=_FOLD_BREV),
        grid=(B, nbc),
        in_specs=in_specs + [inspec, inspec],
        out_specs=[ospec, ospec],
        out_shape=[jax.ShapeDtypeStruct((B, a, nbc, s1, _LANE), jnp.uint32)] * 2,
        interpret=interpret,
        **_compile_kwargs(interpret),
    )(*operands, lo, hi)

    # middle data movement between the phases. With _FOLD_BREV both
    # bit-reversals live INSIDE the kernels as VMEM row movements (DIF
    # un-reverses its output, DIT reverses its input), so this is a PURE
    # transpose to [b, B, a]; otherwise two row-granular gathers ride along.
    s2 = _sublanes_for(lg_b)
    blk2 = s2 * _LANE
    nV2 = (B * a) // blk2

    # ROOFLINE lever 3: the DIT column axis is order-free, so when the final
    # per-output-row column count divides into whole lane blocks, the mid
    # transpose pre-permutes columns into the FINAL order (interleaved
    # (k1, j) for the coset-LDE, plain (B, k1) otherwise) and the DIT
    # kernels block-write the final layout — no post-DIT transpose.
    R_il = interleave or 1
    P = B // R_il
    fold_out = (_FOLD_OUT and _FOLD_BREV
                and (a * R_il) % blk2 == 0 and (interleave or a >= blk2))

    if fold_out:
        cpr = (a * R_il) // blk2

        def mid(x):
            x = x.reshape(P, R_il, a, b)
            x = jnp.transpose(x, (3, 0, 2, 1))  # [b, P, a, R]
            return x.reshape(b, nV2, s2, _LANE)

        lo, hi = _dit_planes(mid(lo), mid(hi), lg_b, s2, interpret, inverse,
                             pre_brev=True, out_layout=(P, cpr))
        out = join_planes(lo, hi).reshape(P, b * a * R_il)
        if interleave:
            out_batch = batch if scale is not None else batch[:-1]
            return out.reshape(out_batch + (n * R_il,))
        return out.reshape(batch + (n,))

    if _FOLD_BREV:
        def mid(x):
            x = jnp.transpose(x.reshape(B, a, b), (2, 0, 1))
            return x.reshape(b, nV2, s2, _LANE)
    else:
        brev_a = jnp.asarray(bit_reverse_perm(lg_a))
        brev_b = jnp.asarray(bit_reverse_perm(lg_b))

        def mid(x):
            x = jnp.transpose(x.reshape(B, a, b)[:, brev_a], (2, 0, 1))
            return x[brev_b].reshape(b, nV2, s2, _LANE)

    lo, hi = _dit_planes(mid(lo), mid(hi), lg_b, s2, interpret, inverse,
                         pre_brev=_FOLD_BREV)

    out = join_planes(lo, hi)
    if interleave:
        # interleaved-coset LDE epilogue: batch is [P, R]; emit
        # out[p, (k1 + a·k2)·R + j] in ONE transpose (folds the caller's
        # swapaxes pass into the four-step's own output movement)
        R = interleave
        P = B // R
        o = out.reshape(b, P, R, a)
        out_batch = batch if scale is not None else batch[:-1]
        return jnp.transpose(o, (1, 0, 3, 2)).reshape(out_batch + (n * R,))
    out = out.reshape(b, B, a)
    return jnp.transpose(out, (1, 0, 2)).reshape(batch + (n,))
