"""End-to-end prove+verify on the real TPU (axon), with phase timings.

First run seeds the persistent compilation cache; repeat runs measure the
warm prover wall-time.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402

import plonky2_tpu  # noqa: E402
from plonky2_tpu.plonk.circuit_builder import CircuitBuilder  # noqa: E402
from plonky2_tpu.plonk.circuit_data import CircuitConfig  # noqa: E402
from plonky2_tpu.iop.witness import PartialWitness  # noqa: E402
from plonky2_tpu.util import TimingTree  # noqa: E402


def main():
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    x = b.add_virtual_target()
    cur = x
    for i in range(4000):
        cur = b.mul(cur, b.constant(i % 89 + 1))
    b.register_public_input(cur)
    data = b.build()
    print("build:", round(time.time() - t0, 1), "s; rows:", data.common.degree,
          flush=True)

    for run in range(2):
        pw = PartialWitness()
        pw.set_target(x, 3)
        timing = TimingTree()
        t0 = time.time()
        proof = data.prove(pw, timing=timing)
        print(f"prove[{run}]:", round(time.time() - t0, 1), "s", flush=True)
        timing.print()
        t0 = time.time()
        data.verify(proof)
        print("verify:", round(time.time() - t0, 1), "s", flush=True)


if __name__ == "__main__":
    main()
