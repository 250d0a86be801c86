"""Test configuration: run everything on a virtual 8-device CPU mesh.

The real TPU (axon tunnel) has high per-compile latency; tests validate
correctness and sharding semantics on CPU. TPU execution is exercised by
bench.py and the driver's compile checks.
"""

import os

# Must be set before the CPU client initializes. (jax may already be
# imported by the interpreter's startup hooks; XLA:CPU compile times on this
# 4-core VM vary wildly run-to-run regardless — big-compile tests are
# env-gated, see test_pallas_ops.py.)
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import plonky2_tpu  # noqa: F401  (enables x64)
