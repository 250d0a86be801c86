"""CosetInterpolationGate: barycentric interpolation of a coset-indexed
vector at an extension point, with degree-bounded intermediate wires
(reference gates/coset_interpolation.rs). Workhorse of in-circuit FRI folds.

Evaluation strategy (reference comment, coset_interpolation.rs:39-57):
interpolate over the fixed subgroup H (weights are compile-time constants)
at the shifted point z/shift, tracking running sequences
  p[i] = p[i-1] * (z - x[i-1])          (partial products)
  e[i] = e[i-1] * (z - x[i-1]) + w[i-1] * v[i-1] * p[i-1]
so e[N] is the barycentric *first-form* numerator — no in-circuit division.
"""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.gates.ops import (
    ealg_add,
    ealg_from_base,
    ealg_mul,
    ealg_sub,
    ealg_zero,
)
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import Wire

D = 2


def subgroup_barycentric_weights(subgroup_bits: int) -> list[int]:
    """w_i = prod_{j != i} (x_i - x_j)^-1 over the two-adic subgroup."""
    pts = fs.two_adic_subgroup(subgroup_bits)
    n = len(pts)
    prods = []
    for i in range(n):
        acc = 1
        for j in range(n):
            if j != i:
                acc = fs.mul(acc, fs.sub(pts[i], pts[j]))
        prods.append(acc)
    return fs.batch_inverse(prods)


def _partial_interpolate(ops, domain, values, weights, x, init_eval, init_prod):
    """One degree-bounded chunk of the running interpolation. domain/weights
    are python ints; values are ealg elements; x is an ealg element."""
    ev, prod = init_eval, init_prod
    for x_i, v, w in zip(domain, values, weights):
        term = ealg_sub(ops, x, ealg_from_base(ops, ops.constant(x_i), D))
        wv = tuple(ops.mul_const(w, c) for c in v)
        ev = ealg_add(ops, ealg_mul(ops, ev, term), ealg_mul(ops, wv, prod))
        prod = ealg_mul(ops, prod, term)
    return ev, prod


def _partial_interpolate_scalar(domain, values, weights, x, init_eval, init_prod):
    """Host-scalar twin over F_{p^D} tuples (witness generation)."""
    ev, prod = init_eval, init_prod
    for x_i, v, w in zip(domain, values, weights):
        term = fs.ext_sub(x, fs.ext_from_base(x_i, D))
        wv = fs.ext_scalar_mul(w, v)
        ev = fs.ext_add(fs.ext_mul(ev, term), fs.ext_mul(wv, prod))
        prod = fs.ext_mul(prod, term)
    return ev, prod


class CosetInterpolationGate(Gate):
    def __init__(self, subgroup_bits: int, max_degree: int | None = None):
        if max_degree is None:
            max_degree = 1 << subgroup_bits
        assert max_degree > 1, "need at least quadratic constraints"
        n_points = 1 << subgroup_bits
        n_intermediates = (n_points - 2) // (max_degree - 1)
        self.subgroup_bits = subgroup_bits
        self._degree = (n_points - 2) // (n_intermediates + 1) + 2
        self.barycentric_weights = subgroup_barycentric_weights(subgroup_bits)

    def num_points(self) -> int:
        return 1 << self.subgroup_bits

    def wire_shift(self) -> int:
        return 0

    def _start_values(self) -> int:
        return 1

    def wires_value(self, i: int) -> range:
        start = self._start_values() + i * D
        return range(start, start + D)

    def _start_evaluation_point(self) -> int:
        return self._start_values() + self.num_points() * D

    def wires_evaluation_point(self) -> range:
        start = self._start_evaluation_point()
        return range(start, start + D)

    def _start_evaluation_value(self) -> int:
        return self._start_evaluation_point() + D

    def wires_evaluation_value(self) -> range:
        start = self._start_evaluation_value()
        return range(start, start + D)

    def _start_intermediates(self) -> int:
        return self._start_evaluation_value() + D

    def num_routed_wires_used(self) -> int:
        return self._start_intermediates()

    def num_intermediates(self) -> int:
        return (self.num_points() - 2) // (self._degree - 1)

    def wires_intermediate_eval(self, i: int) -> range:
        start = self._start_intermediates() + D * i
        return range(start, start + D)

    def wires_intermediate_prod(self, i: int) -> range:
        start = self._start_intermediates() + D * (self.num_intermediates() + i)
        return range(start, start + D)

    def wires_shifted_evaluation_point(self) -> range:
        start = self._start_intermediates() + D * 2 * self.num_intermediates()
        return range(start, start + D)

    def id(self) -> str:
        return (
            f"CosetInterpolationGate {{ subgroup_bits: {self.subgroup_bits}, "
            f"degree: {self._degree} }}<D={D}>"
        )

    def eval_unfiltered(self, ops, vars) -> list:
        constraints = []
        shift = vars.local_wires[self.wire_shift()]
        evaluation_point = vars.get_local_ext_algebra(self.wires_evaluation_point())
        shifted_evaluation_point = vars.get_local_ext_algebra(
            self.wires_shifted_evaluation_point()
        )
        # evaluation_point == shift * shifted_evaluation_point
        constraints.extend(
            ealg_sub(ops, evaluation_point,
                     tuple(ops.mul(shift, c) for c in shifted_evaluation_point))
        )

        domain = fs.two_adic_subgroup(self.subgroup_bits)
        values = [vars.get_local_ext_algebra(self.wires_value(i))
                  for i in range(self.num_points())]
        weights = self.barycentric_weights
        degree = self._degree

        ev, prod = _partial_interpolate(
            ops, domain[:degree], values[:degree], weights[:degree],
            shifted_evaluation_point, ealg_zero(ops, D),
            ealg_from_base(ops, ops.one(), D),
        )
        for i in range(self.num_intermediates()):
            intermediate_eval = vars.get_local_ext_algebra(self.wires_intermediate_eval(i))
            intermediate_prod = vars.get_local_ext_algebra(self.wires_intermediate_prod(i))
            constraints.extend(ealg_sub(ops, intermediate_eval, ev))
            constraints.extend(ealg_sub(ops, intermediate_prod, prod))
            start = 1 + (degree - 1) * (i + 1)
            end = min(start + degree - 1, self.num_points())
            ev, prod = _partial_interpolate(
                ops, domain[start:end], values[start:end], weights[start:end],
                shifted_evaluation_point, intermediate_eval, intermediate_prod,
            )

        evaluation_value = vars.get_local_ext_algebra(self.wires_evaluation_value())
        constraints.extend(ealg_sub(ops, evaluation_value, ev))
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized: every chunk's running (eval, prod) pair restarts from
        witness intermediate wires, so the nI+1 chunks are independent — they
        run in parallel along a leading chunk axis, with ragged chunk lengths
        padded by identity steps (term=1, w·v=0). Same values and constraint
        order as eval_unfiltered."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        N = self.num_points()
        deg = self._degree
        nI = self.num_intermediates()
        C = nI + 1
        Q = wires.shape[-1]
        domain = fs.two_adic_subgroup(self.subgroup_bits)
        weights = self.barycentric_weights

        chunks = [list(range(deg))]
        for j in range(1, C):
            start = 1 + (deg - 1) * j
            chunks.append(list(range(start, min(start + deg - 1, N))))
        L = max(len(c) for c in chunks)
        idx = np.zeros((L, C), np.int32)
        valid = np.zeros((L, C), bool)
        xi = np.zeros((L, C), np.uint64)
        wt = np.zeros((L, C), np.uint64)
        for j, ch in enumerate(chunks):
            for t, k in enumerate(ch):
                idx[t, j], valid[t, j] = k, True
                xi[t, j], wt[t, j] = domain[k], weights[k]

        take = lambda rows: jnp.take(
            wires, jnp.asarray(np.asarray(rows, np.int32)), axis=0)
        sv = self._start_values()
        v0 = take([sv + k * D for k in range(N)])  # [N, Q]
        v1 = take([sv + k * D + 1 for k in range(N)])
        flat = jnp.asarray(idx.reshape(-1))
        v0s = jnp.take(v0, flat, axis=0).reshape(L, C, Q)
        v1s = jnp.take(v1, flat, axis=0).reshape(L, C, Q)

        sep = list(self.wires_shifted_evaluation_point())
        x = (wires[sep[0]][None], wires[sep[1]][None])  # ext point, [1, Q]

        zero = jnp.zeros((1, Q), dtype=jnp.uint64)
        one = jnp.ones((1, Q), dtype=jnp.uint64)
        if nI:
            ie0 = take([self.wires_intermediate_eval(i)[0] for i in range(nI)])
            ie1 = take([self.wires_intermediate_eval(i)[1] for i in range(nI)])
            ip0 = take([self.wires_intermediate_prod(i)[0] for i in range(nI)])
            ip1 = take([self.wires_intermediate_prod(i)[1] for i in range(nI)])
            ev = (jnp.concatenate([zero, ie0]), jnp.concatenate([zero, ie1]))
            prod = (jnp.concatenate([one, ip0]), jnp.concatenate([zero, ip1]))
        else:
            ev, prod = (zero, zero), (one, zero)

        xiJ, wtJ = jnp.asarray(xi), jnp.asarray(wt)
        for t in range(L):
            term0 = g.sub(jnp.broadcast_to(x[0], (C, Q)), xiJ[t][:, None])
            term1 = jnp.broadcast_to(x[1], (C, Q))
            wv0 = g.mul(wtJ[t][:, None], v0s[t])
            wv1 = g.mul(wtJ[t][:, None], v1s[t])
            if not valid[t].all():  # identity-pad the ragged tail
                m = jnp.asarray(valid[t])[:, None]
                u0, u1 = jnp.uint64(0), jnp.uint64(1)
                term0 = jnp.where(m, term0, u1)
                term1 = jnp.where(m, term1, u0)
                wv0 = jnp.where(m, wv0, u0)
                wv1 = jnp.where(m, wv1, u0)
            term = (term0, term1)
            ev = g.ext2_add(g.ext2_mul(ev, term), g.ext2_mul((wv0, wv1), prod))
            prod = g.ext2_mul(prod, term)

        shift = wires[self.wire_shift()]
        ep = list(self.wires_evaluation_point())
        rows = [g.sub(wires[ep[0]], g.mul(shift, wires[sep[0]]))[None],
                g.sub(wires[ep[1]], g.mul(shift, wires[sep[1]]))[None]]
        if nI:
            block = jnp.stack(
                [g.sub(ie0, ev[0][:nI]), g.sub(ie1, ev[1][:nI]),
                 g.sub(ip0, prod[0][:nI]), g.sub(ip1, prod[1][:nI])], axis=1)
            rows.append(block.reshape(4 * nI, Q))
        evv = list(self.wires_evaluation_value())
        rows += [g.sub(wires[evv[0]], ev[0][nI])[None],
                 g.sub(wires[evv[1]], ev[1][nI])[None]]
        return jnp.concatenate(rows, axis=0)

    def generators(self, row: int, local_constants) -> list:
        return [InterpolationGenerator(row, self.subgroup_bits, self._degree)]

    def num_wires(self) -> int:
        return self._start_intermediates() + D * (2 * self.num_intermediates() + 1)

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return self._degree

    def num_constraints(self) -> int:
        return D + D + 2 * D * self.num_intermediates()


_GATE_CACHE: dict = {}


def _cached_gate(subgroup_bits: int, degree: int) -> "CosetInterpolationGate":
    key = (subgroup_bits, degree)
    g = _GATE_CACHE.get(key)
    if g is None:
        g = _GATE_CACHE[key] = CosetInterpolationGate(subgroup_bits, degree)
    return g


class InterpolationGenerator(SimpleGenerator):
    def __init__(self, row: int, subgroup_bits: int, degree: int):
        self.row = row
        self.subgroup_bits = subgroup_bits
        self.degree = degree

    def _gate(self) -> CosetInterpolationGate:
        return _cached_gate(self.subgroup_bits, self.degree)

    def dependencies(self):
        gate = self._gate()
        deps = [Wire(self.row, gate.wire_shift())]
        deps += [Wire(self.row, w) for w in gate.wires_evaluation_point()]
        for i in range(gate.num_points()):
            deps += [Wire(self.row, w) for w in gate.wires_value(i)]
        return deps

    def outputs(self):
        gate = self._gate()
        cols = list(gate.wires_shifted_evaluation_point())
        for i in range(gate.num_intermediates()):
            cols += list(gate.wires_intermediate_eval(i))
            cols += list(gate.wires_intermediate_prod(i))
        cols += list(gate.wires_evaluation_value())
        return [Wire(self.row, c) for c in cols]

    @classmethod
    def run_batch(cls, gens, witness):
        """Vectorized barycentric partial interpolation over every row of
        the level: numpy ext2 recurrence over the subgroup points (the
        scalar path pays a Python loop over all points PER ROW), native
        Montgomery batch inversion for the coset shifts."""
        import numpy as np

        from plonky2_tpu import native
        from plonky2_tpu.field import np_field as npf

        by: dict = {}
        for g in gens:
            by.setdefault((g.subgroup_bits, g.degree), []).append(g)
        for (sb, deg), group in by.items():
            gate = _cached_gate(sb, deg)
            n = len(group)
            rows = np.fromiter((g.row for g in group), np.int64, n)
            get = lambda col: witness.get_reps(witness.wire_reps(rows, col))
            reps_out, vals_out = [], []

            def put(col, v):
                reps_out.append(witness.wire_reps(rows, col))
                vals_out.append(v)

            shift = get(gate.wire_shift())
            if native.available:
                inv_shift = native.batch_inverse(shift)
            else:
                inv_shift = np.fromiter(
                    (fs.inverse(int(s)) for s in shift), np.uint64, n)
            epc = list(gate.wires_evaluation_point())
            x0 = npf.mul(inv_shift, get(epc[0]))
            x1 = npf.mul(inv_shift, get(epc[1]))
            sec = list(gate.wires_shifted_evaluation_point())
            put(sec[0], x0)
            put(sec[1], x1)

            domain = fs.two_adic_subgroup(sb)
            weights = gate.barycentric_weights
            vals = [(get(c[0]), get(c[1]))
                    for i in range(gate.num_points())
                    for c in (list(gate.wires_value(i)),)]

            ev0 = np.zeros(n, np.uint64)
            ev1 = np.zeros(n, np.uint64)
            pr0 = np.ones(n, np.uint64)
            pr1 = np.zeros(n, np.uint64)

            def steps(lo, hi, ev0, ev1, pr0, pr1):
                for j in range(lo, hi):
                    t0 = npf.sub(x0, np.uint64(domain[j]))
                    w = np.uint64(weights[j])
                    wv0 = npf.mul(w, vals[j][0])
                    wv1 = npf.mul(w, vals[j][1])
                    a0, a1 = npf.ext2_mul(ev0, ev1, t0, x1)
                    b0, b1 = npf.ext2_mul(wv0, wv1, pr0, pr1)
                    ev0, ev1 = npf.ext2_add(a0, a1, b0, b1)
                    pr0, pr1 = npf.ext2_mul(pr0, pr1, t0, x1)
                return ev0, ev1, pr0, pr1

            ev0, ev1, pr0, pr1 = steps(0, deg, ev0, ev1, pr0, pr1)
            for i in range(gate.num_intermediates()):
                iec = list(gate.wires_intermediate_eval(i))
                ipc = list(gate.wires_intermediate_prod(i))
                put(iec[0], ev0)
                put(iec[1], ev1)
                put(ipc[0], pr0)
                put(ipc[1], pr1)
                start = 1 + (deg - 1) * (i + 1)
                end = min(start + deg - 1, gate.num_points())
                ev0, ev1, pr0, pr1 = steps(start, end, ev0, ev1, pr0, pr1)
            evc = list(gate.wires_evaluation_value())
            put(evc[0], ev0)
            put(evc[1], ev1)
            witness.set_reps(np.concatenate(reps_out),
                             np.concatenate(vals_out))

    def run_once(self, witness, out):
        gate = self._gate()
        row = self.row
        ext = lambda rng: tuple(witness.get_target(Wire(row, w)) for w in rng)
        set_ext = lambda rng, v: [
            out.set_target(Wire(row, w), c) for w, c in zip(rng, v)
        ]

        evaluation_point = ext(gate.wires_evaluation_point())
        shift = witness.get_target(Wire(row, gate.wire_shift()))
        shifted_evaluation_point = fs.ext_scalar_mul(fs.inverse(shift), evaluation_point)
        set_ext(gate.wires_shifted_evaluation_point(), shifted_evaluation_point)

        domain = fs.two_adic_subgroup(gate.subgroup_bits)
        values = [ext(gate.wires_value(i)) for i in range(gate.num_points())]
        weights = gate.barycentric_weights
        degree = gate._degree

        ev, prod = _partial_interpolate_scalar(
            domain[:degree], values[:degree], weights[:degree],
            shifted_evaluation_point, fs.ext_zero(D), fs.ext_one(D),
        )
        for i in range(gate.num_intermediates()):
            set_ext(gate.wires_intermediate_eval(i), ev)
            set_ext(gate.wires_intermediate_prod(i), prod)
            start = 1 + (degree - 1) * (i + 1)
            end = min(start + degree - 1, gate.num_points())
            ev, prod = _partial_interpolate_scalar(
                domain[start:end], values[start:end], weights[start:end],
                shifted_evaluation_point, ev, prod,
            )
        set_ext(gate.wires_evaluation_value(), ev)
