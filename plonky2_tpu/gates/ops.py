"""Generic field-operation backends for gate constraint evaluation.

Each gate's constraints are written ONCE against this ops protocol and then
instantiated three ways:
  - `HostExtOps`: scalar F_{p^2} tuples — verifier evaluation at zeta
    (reference `eval_unfiltered`);
  - `DeviceBaseOps`: batched uint64 arrays over the whole quotient sub-LDE
    domain — prover hot loop (reference `eval_unfiltered_base_batch`, but one
    fused XLA program over all points instead of 32-point SIMD chunks);
  - `CircuitOps` (recursion): emits circuit targets — the in-circuit dual
    (reference `eval_unfiltered_circuit`). Constraint ORDER is identical by
    construction, which the reference must maintain by hand
    (gates/gate.rs:122-132).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from plonky2_tpu.field import goldilocks as g
from plonky2_tpu.field import scalar as fs


class HostExtOps:
    """Values are D=2 extension tuples of Python ints."""

    def constant(self, c: int):
        return fs.ext_from_base(c % fs.P, 2)

    def zero(self):
        return (0, 0)

    def one(self):
        return (1, 0)

    def add(self, a, b):
        return fs.ext_add(a, b)

    def sub(self, a, b):
        return fs.ext_sub(a, b)

    def mul(self, a, b):
        return fs.ext_mul(a, b)

    def square(self, a):
        return fs.ext_mul(a, a)

    def neg(self, a):
        return fs.ext_neg(a)

    def add_const(self, a, c: int):
        return (fs.add(a[0], c % fs.P), a[1])

    def mul_const(self, c: int, a):
        return fs.ext_scalar_mul(c % fs.P, a)


class DeviceBaseOps:
    """Values are uint64 jnp arrays (base field), batched over domain points."""

    def constant(self, c: int):
        return jnp.asarray(np.uint64(c % fs.P))

    def zero(self):
        return jnp.zeros((), dtype=jnp.uint64)

    def one(self):
        return jnp.ones((), dtype=jnp.uint64)

    def add(self, a, b):
        return g.add(a, b)

    def sub(self, a, b):
        return g.sub(a, b)

    def mul(self, a, b):
        return g.mul(a, b)

    def square(self, a):
        return g.square(a)

    def neg(self, a):
        return g.neg(a)

    def add_const(self, a, c: int):
        return g.add(a, self.constant(c))

    def mul_const(self, c: int, a):
        return g.mul(self.constant(c), a)


class HostBaseOps:
    """Values are scalar Python ints (base field) — witness generation."""

    def constant(self, c: int):
        return c % fs.P

    def zero(self):
        return 0

    def one(self):
        return 1

    def add(self, a, b):
        return fs.add(a, b)

    def sub(self, a, b):
        return fs.sub(a, b)

    def mul(self, a, b):
        return fs.mul(a, b)

    def square(self, a):
        return fs.mul(a, a)

    def neg(self, a):
        return fs.neg(a)

    def add_const(self, a, c: int):
        return fs.add(a, c % fs.P)

    def mul_const(self, c: int, a):
        return fs.mul(c % fs.P, a)


class NumpyBaseOps:
    """Values are numpy u64 arrays — the witness batch engine runs the same
    ops-generic gate code vectorized over all rows of a generator batch."""

    def __init__(self):
        import numpy as np

        from plonky2_tpu.field import np_field as npf

        self._np = np
        self._f = npf

    def constant(self, c: int):
        return self._np.uint64(c % fs.P)

    def zero(self):
        return self._np.uint64(0)

    def one(self):
        return self._np.uint64(1)

    def add(self, a, b):
        return self._f.add(a, b)

    def sub(self, a, b):
        return self._f.sub(a, b)

    def mul(self, a, b):
        return self._f.mul(a, b)

    def square(self, a):
        return self._f.mul(a, a)

    def neg(self, a):
        return self._f.neg(a)

    def add_const(self, a, c: int):
        return self._f.add(a, self._np.uint64(c % fs.P))

    def mul_const(self, c: int, a):
        return self._f.mul(self._np.uint64(c % fs.P), a)


class EvaluationVars:
    """local_constants / local_wires / public_inputs_hash are sequences of
    ops-domain values (pre-lifted by the caller)."""

    def __init__(self, local_constants, local_wires, public_inputs_hash):
        self.local_constants = local_constants
        self.local_wires = local_wires
        self.public_inputs_hash = public_inputs_hash

    def get_local_ext_algebra(self, rng) -> tuple:
        """D consecutive wires as an extension-algebra element
        (reference plonk/vars.rs get_local_ext_algebra)."""
        return tuple(self.local_wires[i] for i in rng)


class CircuitOps:
    """Ops backend emitting circuit operations over ExtensionTargets — the
    in-circuit dual (reference `eval_unfiltered_circuit`). Because every gate
    and the vanishing polynomial are written once against the ops protocol,
    constraint ORDER matches the native evaluations by construction (the
    reference must maintain this by hand, gates/gate.rs:122-132)."""

    def __init__(self, builder):
        self.builder = builder

    def constant(self, c):
        if isinstance(c, int):
            return self.builder.constant_extension(c % ((1 << 64) - (1 << 32) + 1))
        return self.builder.constant_extension(c)

    def zero(self):
        return self.builder.zero_extension()

    def one(self):
        return self.builder.one_extension()

    def add(self, a, b):
        return self.builder.add_extension(a, b)

    def sub(self, a, b):
        return self.builder.sub_extension(a, b)

    def mul(self, a, b):
        return self.builder.mul_extension(a, b)

    def square(self, a):
        return self.builder.square_extension(a)

    def neg(self, a):
        return self.builder.mul_const_extension(-1, a)

    def add_const(self, a, c: int):
        return self.builder.add_const_extension(a, c)

    def mul_const(self, c: int, a):
        return self.builder.mul_const_extension(c, a)

    def from_base_target(self, t):
        """Lift a base Target into the extension ops domain."""
        return self.builder.convert_to_ext(t)


# -- extension algebra over the ops domain -----------------------------------
# F_{p^D}[X]/(X^D - W) with coefficients that are themselves ops-domain
# values (reference field/src/extension/algebra.rs). Elements are D-tuples.

_EALG_W = 7  # W for D=2 Goldilocks (scalar.EXT_W[2])


def ealg_zero(ops, d: int = 2) -> tuple:
    return tuple(ops.zero() for _ in range(d))


def ealg_from_base(ops, x, d: int = 2) -> tuple:
    return (x,) + tuple(ops.zero() for _ in range(d - 1))


def ealg_add(ops, a, b) -> tuple:
    return tuple(ops.add(x, y) for x, y in zip(a, b))


def ealg_sub(ops, a, b) -> tuple:
    return tuple(ops.sub(x, y) for x, y in zip(a, b))


def ealg_scalar_mul(ops, c, a) -> tuple:
    """c is an ops-domain value (the algebra's scalar field)."""
    return tuple(ops.mul(c, x) for x in a)


def ealg_mul(ops, a, b, w: int = _EALG_W) -> tuple:
    d = len(a)
    acc = [ops.zero()] * d
    for i in range(d):
        for j in range(d):
            k = i + j
            t = ops.mul(a[i], b[j])
            if k >= d:
                k -= d
                t = ops.mul_const(w, t)
            acc[k] = ops.add(acc[k], t)
    return tuple(acc)
