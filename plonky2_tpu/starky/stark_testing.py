"""STARK test kit (reference starky/src/stark_testing.rs:25-76).

`test_stark_low_degree` extends a random trace to a larger domain, evaluates
the AIR constraints pointwise, and iNTT-certifies every constraint stays
within the claimed degree bound.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from plonky2_tpu.field import ntt, scalar as fs
from plonky2_tpu.gates.ops import DeviceBaseOps
from plonky2_tpu.starky.constraint_consumer import ConstraintConsumer
from plonky2_tpu.starky.evaluation_frame import StarkFrame


def test_stark_low_degree(stark, degree_bits: int = 3, seed: int = 0) -> None:
    """Constraint-degree certification on a 2^(degree_bits+2) domain."""
    rng = np.random.default_rng(seed)
    n = 1 << degree_bits
    rate_bits = 2
    big_n = n << rate_bits

    trace_coeffs = rng.integers(0, fs.P, size=(stark.COLUMNS, n), dtype=np.uint64)
    # evaluate on the larger PLAIN subgroup (shift=1): next-row rotation is a
    # shift by 2^rate_bits
    big = np.asarray(ntt.lde_fft(jnp.asarray(trace_coeffs), rate_bits, shift=1))
    nxt = np.roll(big, -(1 << rate_bits), axis=1)
    pis = rng.integers(0, fs.P, size=(stark.PUBLIC_INPUTS,), dtype=np.uint64)

    ops = DeviceBaseOps()
    frame = StarkFrame(
        [jnp.asarray(big[i]) for i in range(stark.COLUMNS)],
        [jnp.asarray(nxt[i]) for i in range(stark.COLUMNS)],
        [jnp.asarray(np.uint64(p)) for p in pis],
    )

    class _Collector:
        def __init__(self):
            self.items = []

        def constraint(self, c):
            self.items.append(("all", c))

        def constraint_transition(self, c):
            self.items.append(("transition", c))

        def constraint_first_row(self, c):
            self.items.append(("first", c))

        def constraint_last_row(self, c):
            self.items.append(("last", c))

    collector = _Collector()
    stark.eval(ops, frame, collector)

    cdeg = stark.constraint_degree()
    for kind, c in collector.items:
        vals = np.broadcast_to(np.asarray(c), (big_n,))
        coeffs = np.asarray(ntt.ifft(jnp.asarray(vals)))
        # raw constraint degree bound: cdeg * (n - 1)
        max_deg = cdeg * (n - 1)
        assert not coeffs[max_deg + 1:].any(), (
            f"{kind} constraint exceeds claimed degree {cdeg}"
        )


def test_stark_constraints_on_trace(stark, trace, public_inputs) -> None:
    """Replays all constraints on a concrete trace with exact host scalars —
    the debug_assertions check_constraints analog."""
    from plonky2_tpu.gates.ops import HostBaseOps

    cols, n = trace.shape
    ops = HostBaseOps()
    for r in range(n):
        r_next = (r + 1) % n
        frame = StarkFrame(
            [int(trace[c, r]) for c in range(cols)],
            [int(trace[c, r_next]) for c in range(cols)],
            list(public_inputs),
        )

        class _Checker:
            def constraint(self, c):
                assert c == 0, f"constraint violated at row {r}"

            def constraint_transition(self, c):
                if r != n - 1:
                    assert c == 0, f"transition constraint violated at row {r}"

            def constraint_first_row(self, c):
                if r == 0:
                    assert c == 0, "first-row constraint violated"

            def constraint_last_row(self, c):
                if r == n - 1:
                    assert c == 0, "last-row constraint violated"

        stark.eval(ops, frame, _Checker())


def test_stark_circuit_constraints(stark, degree_bits: int = 3, seed: int = 0,
                                   public_inputs=None) -> None:
    """Native vs in-circuit constraint evaluation equality (reference
    stark_testing.rs:76-130): evaluate the alpha-accumulated constraints on
    a random frame once with host extension scalars and once through
    CircuitOps in a proven plonky2 circuit, and assert equal results.

    With the ops-generic Stark.eval the two share one definition by
    construction; this still drives the CircuitOps path (arithmetic gates,
    ext ops) end-to-end through a real prove."""
    from plonky2_tpu.field import scalar as fs
    from plonky2_tpu.gates.ops import CircuitOps, HostExtOps
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.starky.constraint_consumer import ConstraintConsumer

    rng = np.random.default_rng(seed)
    D = 2
    cols = stark.COLUMNS
    pis = list(public_inputs if public_inputs is not None
               else rng.integers(0, fs.P, stark.PUBLIC_INPUTS, dtype=np.uint64))
    rnd = lambda: tuple(int(x) for x in rng.integers(0, fs.P, D, dtype=np.uint64))
    local = [rnd() for _ in range(cols)]
    nxt = [rnd() for _ in range(cols)]
    alphas = [rnd(), rnd()]
    z_last, l_first, l_last = rnd(), rnd(), rnd()

    # host evaluation
    hops = HostExtOps()
    consumer = ConstraintConsumer(hops, alphas, z_last, l_first, l_last)
    frame = StarkFrame(list(local), list(nxt),
                       [fs.ext_from_base(int(p), D) for p in pis])
    stark.eval(hops, frame, consumer)
    expected = consumer.accumulators()

    # in-circuit evaluation, proven
    b = CircuitBuilder(CircuitConfig.standard_recursion_config())
    ops = CircuitOps(b)
    ce = b.constant_extension
    consumer_t = ConstraintConsumer(
        ops, [ce(a) for a in alphas], ce(z_last), ce(l_first), ce(l_last))
    frame_t = StarkFrame([ce(v) for v in local], [ce(v) for v in nxt],
                         [ce(fs.ext_from_base(int(p), D)) for p in pis])
    stark.eval(ops, frame_t, consumer_t)
    for acc in consumer_t.accumulators():
        b.register_public_inputs(list(acc.parts))
    data = b.build()
    proof = data.prove(PartialWitness())
    data.verify(proof)
    got = [tuple(proof.public_inputs[i:i + D])
           for i in range(0, len(proof.public_inputs), D)]
    assert got == list(expected), "in-circuit constraint evaluation mismatch"
