"""plonky2_tpu — a TPU-native recursive-SNARK framework (plonky2/starky capability set).

Brand-new JAX/XLA/Pallas implementation of a PLONK + FRI proving system over the
64-bit Goldilocks field, with Poseidon hashing, Merkle-cap commitments, custom
gates, recursive proof composition, and a STARK/AIR prover (starky equivalent).

Architecture (TPU-first, not a port):
  - Device code: batched field arithmetic, NTT/LDE, Poseidon/Merkle, constraint
    evaluation, FRI folding — pure jitted XLA programs + Pallas kernels, all
    static shapes, sharded over a `jax.sharding.Mesh` for multi-chip.
  - Host code: circuit building, witness generator scheduling, Fiat-Shamir
    transcript, proof assembly and serialization.

Reference capability map: see SURVEY.md (structural analysis of
0xPolygonZero/plonky2 @ /root/reference).
"""

import jax

# The Goldilocks field needs 64-bit integer lanes. All device math is expressed
# over uint64 (XLA emulates u64 with 32-bit pairs on TPU); hot kernels are
# re-expressed as explicit 32-bit-limb Pallas kernels in plonky2_tpu/ops/.
jax.config.update("jax_enable_x64", True)

__version__ = "0.1.0"
