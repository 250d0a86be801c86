"""Drive the tensorized gate device evals on the REAL TPU (axon) and
cross-check every value against the scalar golden model (HostBaseOps).

One fused jitted program evaluates all overridden gates -> one remote compile.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import plonky2_tpu  # noqa: E402
from plonky2_tpu.field import scalar as fs  # noqa: E402
from plonky2_tpu.gates.ops import EvaluationVars, HostBaseOps  # noqa: E402
from plonky2_tpu.gates.arithmetic_base import ArithmeticGate  # noqa: E402
from plonky2_tpu.gates.arithmetic_extension import (  # noqa: E402
    ArithmeticExtensionGate,
    MulExtensionGate,
)
from plonky2_tpu.gates.base_sum import BaseSumGate  # noqa: E402
from plonky2_tpu.gates.exponentiation import ExponentiationGate  # noqa: E402
from plonky2_tpu.gates.poseidon_gate import PoseidonGate  # noqa: E402
from plonky2_tpu.gates.poseidon_mds import PoseidonMdsGate  # noqa: E402
from plonky2_tpu.gates.random_access import RandomAccessGate  # noqa: E402
from plonky2_tpu.gates.reducing import ReducingGate, ReducingExtensionGate  # noqa: E402

GATES = [
    (ArithmeticGate(20), 2),
    (ArithmeticExtensionGate(10), 2),
    (MulExtensionGate(13), 1),
    (BaseSumGate(63, 2), 0),
    (ReducingGate(43), 0),
    (ReducingExtensionGate(32), 0),
    (RandomAccessGate(4, 4, 2), 2),
    (ExponentiationGate(17), 0),
    (PoseidonMdsGate(), 0),
    (PoseidonGate(), 0),
]
Q = 4


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(7)
    inputs = []
    for gate, nc in GATES:
        wires = rng.integers(0, fs.P, size=(gate.num_wires(), Q), dtype=np.uint64)
        consts = rng.integers(0, fs.P, size=(max(nc, 1), Q), dtype=np.uint64)
        pi = rng.integers(0, fs.P, size=(4,), dtype=np.uint64)
        inputs.append((wires, consts, pi))

    def all_evals(flat):
        outs = []
        for (gate, _), (w, c, p) in zip(GATES, flat):
            outs.append(gate.eval_unfiltered_device(w, c, p))
        return tuple(outs)

    fn = jax.jit(all_evals)
    t0 = time.time()
    dev_outs = jax.block_until_ready(
        fn(tuple((jnp.asarray(w), jnp.asarray(c), jnp.asarray(p))
                 for w, c, p in inputs)))
    print("compile+run:", round(time.time() - t0, 1), "s", flush=True)

    ops = HostBaseOps()
    n_vals = 0
    for (gate, nc), (wires, consts, pi), dev in zip(GATES, inputs, dev_outs):
        dev = np.asarray(dev)
        assert dev.shape == (gate.num_constraints(), Q), gate.id()
        for p in range(Q):
            # same constants vector the device path saw
            vars = EvaluationVars(
                [int(consts[i, p]) for i in range(consts.shape[0])],
                [int(wires[i, p]) for i in range(gate.num_wires())],
                [int(h) for h in pi],
            )
            expected = [int(e) for e in gate.eval_unfiltered(ops, vars)]
            got = [int(v) for v in dev[:, p]]
            assert got == expected, f"{gate.id()} mismatch at point {p}"
            n_vals += len(expected)
        print("OK", gate.id(), flush=True)
    print(f"ALL OK: {n_vals} values matched scalar golden on", jax.default_backend(),
          flush=True)


if __name__ == "__main__":
    main()
