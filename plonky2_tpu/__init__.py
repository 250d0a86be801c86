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

import os

import jax

# The Goldilocks field needs 64-bit integer lanes. All device math is expressed
# over uint64 (XLA emulates u64 with 32-bit pairs on TPU); hot kernels are
# re-expressed as explicit 32-bit-limb Pallas kernels in plonky2_tpu/ops/.
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: a prover run compiles ~65 distinct XLA
# programs, and TPU compiles go through a slow remote relay — caching them
# across processes turns repeat proves/benches from minutes of compiling
# into seconds. TPU-backend only: XLA:CPU AOT cache entries record the
# COMPILE machine's CPU features (compiles are relayed off-host here), and
# loading feature-mismatched native code on this host segfaults.
# Opt out with PLONKY2_TPU_CACHE=0 or point elsewhere.
_cache_dir = os.environ.get(
    "PLONKY2_TPU_CACHE",
    os.path.join(os.path.expanduser("~"), ".cache", "plonky2_tpu_xla"))
# The platform may be selected either by env var or by a pre-import
# jax.config.update("jax_platforms", "cpu") (the only way to override the
# site-forced env here) — honor both.
_platforms = (getattr(jax.config, "jax_platforms", None)
              or os.environ.get("JAX_PLATFORMS", "axon"))
if _cache_dir != "0" and _platforms not in ("cpu",):
    os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

__version__ = "0.1.0"
