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


import pytest


@pytest.fixture(autouse=True, scope="module")
def _bound_xla_cpu_jit_state():
    """Free compiled executables between test modules.

    Root-cause investigation of the state-dependent XLA:CPU SIGABRT (one
    process running the full suite aborts inside backend_compile_and_load
    after ~125 tests, faulthandler stack in repo history; 125 GB free RAM,
    so not OOM): the abort tracks the NUMBER of live in-process compiled
    executables, not any specific program — moving tests moves the crash.
    Dropping the executable caches at module boundaries keeps the LLVM JIT
    state bounded and the full single-process suite green; xdist module
    sharding (pytest.ini) remains for wall-time only.
    """
    yield
    import jax

    jax.clear_caches()
