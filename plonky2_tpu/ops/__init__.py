"""Fused Pallas TPU kernels for the hot compute paths.

Mosaic (the TPU kernel compiler) has no 64-bit integer support, so every
kernel here works on u32 limb *planes*: a Goldilocks element x is carried as
(lo, hi) = (x & 0xffffffff, x >> 32), and the modular algebra is re-derived
on 32-bit limbs (the same EPSILON identities as
`plonky2_tpu.field.goldilocks`, reference field/src/goldilocks_field.rs).

The payoff is fusion: a full lg_m-stage NTT butterfly network runs over a
VMEM-resident tile in ONE kernel, one HBM read + one HBM write, where the
XLA path materializes every stage to HBM.
"""

from plonky2_tpu.ops.pallas_ntt import butterflies0_pallas, pallas_available

__all__ = ["butterflies0_pallas", "pallas_available"]
