"""PoseidonGate: one full 30-round Poseidon permutation per row, 135 wires,
with Merkle-path swap support (reference gates/poseidon.rs).

The constraint system is written against the fast partial-round decomposition
(w-hat/v sparse MDS, reference hash/poseidon.rs:506-628) — the wire layout and
constraint order are consensus-critical and must match the reference exactly.
Layer functions are defined once over the generic ops protocol and reused by
the verifier (ext), the device batch evaluator, and the witness generator
(scalar base)."""

from __future__ import annotations

from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.hash.poseidon_constants import (
    ALL_ROUND_CONSTANTS,
    HALF_N_FULL_ROUNDS,
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    N_PARTIAL_ROUNDS,
    SPONGE_WIDTH,
)
from plonky2_tpu.hash.poseidon_fast_partial import (
    FAST_PARTIAL_FIRST_ROUND_CONSTANT,
    FAST_PARTIAL_ROUND_CONSTANTS,
    FAST_PARTIAL_ROUND_INITIAL_MATRIX,
    FAST_PARTIAL_ROUND_VS,
    FAST_PARTIAL_ROUND_W_HATS,
)

W = SPONGE_WIDTH


def _build_dev_tables():
    """Constant tables for the tensorized device evaluation, as uint64 numpy.
    Built lazily so importing the gate never touches the device."""
    import numpy as np

    P = (1 << 64) - (1 << 32) + 1
    rc = np.asarray(ALL_ROUND_CONSTANTS, dtype=np.uint64).reshape(30, W)
    mds = np.zeros((W, W), dtype=np.uint64)
    for r in range(W):
        for c in range(W):
            v = MDS_MATRIX_CIRC[(c - r) % W] + (MDS_MATRIX_DIAG[r] if r == c else 0)
            mds[r, c] = v % P
    p_init = np.zeros((W, W), dtype=np.uint64)
    p_init[0, 0] = 1
    for c in range(1, W):
        for r in range(1, W):
            p_init[c, r] = FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1][c - 1] % P
    mds0to0 = (MDS_MATRIX_CIRC[0] + MDS_MATRIX_DIAG[0]) % P
    w_hat_rows = np.zeros((N_PARTIAL_ROUNDS, W), dtype=np.uint64)
    vs_rows = np.zeros((N_PARTIAL_ROUNDS, W - 1), dtype=np.uint64)
    for r in range(N_PARTIAL_ROUNDS):
        w_hat_rows[r, 0] = mds0to0
        for i in range(W - 1):
            w_hat_rows[r, i + 1] = FAST_PARTIAL_ROUND_W_HATS[r][i] % P
            vs_rows[r, i] = FAST_PARTIAL_ROUND_VS[r][i] % P
    return {
        "round_constants": rc,
        "mds": mds,
        "partial_init": p_init,
        "w_hat_rows": w_hat_rows,
        "vs_rows": vs_rows,
        "partial_first_consts": np.asarray(
            FAST_PARTIAL_FIRST_ROUND_CONSTANT, dtype=np.uint64
        ),
    }


class _LazyTables:
    _tables = None

    def __getitem__(self, key):
        if _LazyTables._tables is None:
            _LazyTables._tables = _build_dev_tables()
        return _LazyTables._tables[key]


_DEV_TABLES = _LazyTables()


# -- generic-ops Poseidon layers (fast partial-round form) -------------------

def constant_layer(ops, state, round_ctr):
    return [ops.add_const(state[i], ALL_ROUND_CONSTANTS[i + W * round_ctr]) for i in range(W)]


def sbox_monomial(ops, x):
    x2 = ops.square(x)
    x3 = ops.mul(x2, x)
    x6 = ops.square(x3)
    return ops.mul(x6, x)


def sbox_layer(ops, state):
    return [sbox_monomial(ops, x) for x in state]


def mds_row_shf(ops, r, v):
    acc = ops.zero()
    for i in range(W):
        acc = ops.add(acc, ops.mul_const(MDS_MATRIX_CIRC[i], v[(i + r) % W]))
    acc = ops.add(acc, ops.mul_const(MDS_MATRIX_DIAG[r], v[r]))
    return acc


def mds_layer(ops, state):
    return [mds_row_shf(ops, r, state) for r in range(W)]


def partial_first_constant_layer(ops, state):
    return [ops.add_const(state[i], FAST_PARTIAL_FIRST_ROUND_CONSTANT[i]) for i in range(W)]


def mds_partial_layer_init(ops, state):
    result = [state[0]] + [ops.zero()] * (W - 1)
    for r in range(1, W):
        for c in range(1, W):
            t = FAST_PARTIAL_ROUND_INITIAL_MATRIX[r - 1][c - 1]
            result[c] = ops.add(result[c], ops.mul_const(t, state[r]))
    return result


def mds_partial_layer_fast(ops, state, r):
    mds0to0 = MDS_MATRIX_CIRC[0] + MDS_MATRIX_DIAG[0]
    d = ops.mul_const(mds0to0, state[0])
    for i in range(1, W):
        d = ops.add(d, ops.mul_const(FAST_PARTIAL_ROUND_W_HATS[r][i - 1], state[i]))
    result = [d]
    for i in range(1, W):
        result.append(ops.add(ops.mul_const(FAST_PARTIAL_ROUND_VS[r][i - 1], state[0]), state[i]))
    return result


class PoseidonGate(Gate):
    WIRE_SWAP = 2 * W
    START_DELTA = 2 * W + 1
    START_FULL_0 = START_DELTA + 4
    START_PARTIAL = START_FULL_0 + W * (HALF_N_FULL_ROUNDS - 1)
    START_FULL_1 = START_PARTIAL + N_PARTIAL_ROUNDS
    END = START_FULL_1 + W * HALF_N_FULL_ROUNDS

    @staticmethod
    def wire_input(i):
        return i

    @staticmethod
    def wire_output(i):
        return W + i

    @classmethod
    def wire_delta(cls, i):
        assert i < 4
        return cls.START_DELTA + i

    @classmethod
    def wire_full_sbox_0(cls, round, i):
        assert 0 < round < HALF_N_FULL_ROUNDS
        return cls.START_FULL_0 + W * (round - 1) + i

    @classmethod
    def wire_partial_sbox(cls, round):
        assert round < N_PARTIAL_ROUNDS
        return cls.START_PARTIAL + round

    @classmethod
    def wire_full_sbox_1(cls, round, i):
        assert round < HALF_N_FULL_ROUNDS
        return cls.START_FULL_1 + W * round + i

    def id(self) -> str:
        return f"PoseidonGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH={W}>"

    def eval_unfiltered(self, ops, vars) -> list:
        wires = vars.local_wires
        constraints = []

        swap = wires[self.WIRE_SWAP]
        constraints.append(ops.mul(swap, ops.add_const(swap, (-1))))

        for i in range(4):
            lhs = wires[self.wire_input(i)]
            rhs = wires[self.wire_input(i + 4)]
            delta = wires[self.wire_delta(i)]
            constraints.append(ops.sub(ops.mul(swap, ops.sub(rhs, lhs)), delta))

        state = [None] * W
        for i in range(4):
            delta = wires[self.wire_delta(i)]
            state[i] = ops.add(wires[self.wire_input(i)], delta)
            state[i + 4] = ops.sub(wires[self.wire_input(i + 4)], delta)
        for i in range(8, W):
            state[i] = wires[self.wire_input(i)]

        round_ctr = 0
        # first full rounds
        for r in range(HALF_N_FULL_ROUNDS):
            state = constant_layer(ops, state, round_ctr)
            if r != 0:
                for i in range(W):
                    sbox_in = wires[self.wire_full_sbox_0(r, i)]
                    constraints.append(ops.sub(state[i], sbox_in))
                    state[i] = sbox_in
            state = sbox_layer(ops, state)
            state = mds_layer(ops, state)
            round_ctr += 1

        # partial rounds (fast form)
        state = partial_first_constant_layer(ops, state)
        state = mds_partial_layer_init(ops, state)
        for r in range(N_PARTIAL_ROUNDS - 1):
            sbox_in = wires[self.wire_partial_sbox(r)]
            constraints.append(ops.sub(state[0], sbox_in))
            s0 = sbox_monomial(ops, sbox_in)
            s0 = ops.add_const(s0, FAST_PARTIAL_ROUND_CONSTANTS[r])
            state = mds_partial_layer_fast(ops, [s0] + state[1:], r)
        sbox_in = wires[self.wire_partial_sbox(N_PARTIAL_ROUNDS - 1)]
        constraints.append(ops.sub(state[0], sbox_in))
        s0 = sbox_monomial(ops, sbox_in)
        state = mds_partial_layer_fast(ops, [s0] + state[1:], N_PARTIAL_ROUNDS - 1)
        round_ctr += N_PARTIAL_ROUNDS

        # second full rounds
        for r in range(HALF_N_FULL_ROUNDS):
            state = constant_layer(ops, state, round_ctr)
            for i in range(W):
                sbox_in = wires[self.wire_full_sbox_1(r, i)]
                constraints.append(ops.sub(state[i], sbox_in))
                state[i] = sbox_in
            state = sbox_layer(ops, state)
            state = mds_layer(ops, state)
            round_ctr += 1

        for i in range(W):
            constraints.append(ops.sub(state[i], wires[self.wire_output(i)]))

        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized batch evaluation: states are [12, Q] arrays and every
        layer is a handful of tensor primitives (MDS layers become modular
        mat-vecs), so the XLA graph stays small. Constraint order matches
        eval_unfiltered exactly."""
        import numpy as np
        import jax
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g

        cls = PoseidonGate
        q = wires.shape[-1]
        constraints = []

        swap = wires[cls.WIRE_SWAP]  # [Q]
        one = jnp.ones((), dtype=jnp.uint64)
        constraints.append(g.mul(swap, g.sub(swap, one))[None])

        inputs = wires[0:W]  # [12, Q]
        deltas = wires[cls.START_DELTA:cls.START_DELTA + 4]  # [4, Q]
        lhs, rhs = inputs[0:4], inputs[4:8]
        constraints.append(g.sub(g.mul(swap[None], g.sub(rhs, lhs)), deltas))

        state = jnp.concatenate(
            [g.add(inputs[0:4], deltas), g.sub(inputs[4:8], deltas), inputs[8:W]]
        )

        rc = _DEV_TABLES["round_constants"]  # [30, 12]
        mds = _DEV_TABLES["mds"]  # [12, 12]
        p_init = _DEV_TABLES["partial_init"]  # [12, 12]
        w_hat_rows = _DEV_TABLES["w_hat_rows"]  # [22, 12] (row r: [m00, w_hats...])
        vs_rows = _DEV_TABLES["vs_rows"]  # [22, 11]

        def sbox(x):
            x3 = g.mul(g.square(x), x)
            return g.mul(g.square(x3), x)

        round_ctr = 0
        for r in range(HALF_N_FULL_ROUNDS):
            state = g.add(state, rc[round_ctr][:, None])
            if r != 0:
                sbox_in = wires[cls.START_FULL_0 + W * (r - 1):cls.START_FULL_0 + W * r]
                constraints.append(g.sub(state, sbox_in))
                state = sbox_in
            state = g.matmul_mod(mds, sbox(state))
            round_ctr += 1

        state = g.add(state, _DEV_TABLES["partial_first_consts"][:, None])
        state = g.matmul_mod(p_init, state)
        # one lax.scan over the 22 partial rounds: the body traces once
        # (22x fewer primitives than unrolling; same values/order)
        sbox_ins = wires[cls.START_PARTIAL:cls.START_PARTIAL + N_PARTIAL_ROUNDS]
        rcs = np.asarray(FAST_PARTIAL_ROUND_CONSTANTS[:N_PARTIAL_ROUNDS],
                         dtype=np.uint64).copy()
        rcs[N_PARTIAL_ROUNDS - 1] = 0  # last round adds no constant

        def pstep(st, xs):
            sbox_in, w_hat, vs, rc = xs
            c = g.sub(st[0], sbox_in)
            s0 = g.add(sbox(sbox_in), rc)
            full0 = jnp.concatenate([s0[None], st[1:]])
            d = g.sum_mod(g.mul(w_hat[:, None], full0), axis=0)  # [Q]
            rest = g.add(st[1:], g.mul(vs[:, None], s0[None]))
            return jnp.concatenate([d[None], rest]), c

        state, pcs = jax.lax.scan(
            pstep, state,
            (sbox_ins, w_hat_rows, vs_rows, jnp.asarray(rcs)))
        constraints.append(pcs)  # [22, Q], round order
        round_ctr += N_PARTIAL_ROUNDS

        for r in range(HALF_N_FULL_ROUNDS):
            state = g.add(state, rc[round_ctr][:, None])
            sbox_in = wires[cls.START_FULL_1 + W * r:cls.START_FULL_1 + W * (r + 1)]
            constraints.append(g.sub(state, sbox_in))
            state = g.matmul_mod(mds, sbox(sbox_in))
            round_ctr += 1

        constraints.append(g.sub(state, wires[W:2 * W]))
        return jnp.concatenate(constraints, axis=0)

    def generators(self, row: int, local_constants) -> list:
        return [PoseidonGenerator(row)]

    def num_wires(self) -> int:
        return self.END

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 7

    def num_constraints(self) -> int:
        return (
            1 + 4
            + W * (HALF_N_FULL_ROUNDS - 1)
            + N_PARTIAL_ROUNDS
            + W * HALF_N_FULL_ROUNDS
            + W
        )


from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.ops import HostBaseOps
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import Wire


_OUT_COLS_NP = None  # PoseidonGenerator output columns (identical per row)


class PoseidonGenerator(SimpleGenerator):
    """Fills swap-deltas, per-round S-box input wires and outputs
    (reference gates/poseidon.rs PoseidonGenerator)."""

    # the native C++ kernel (or the numpy path) beats the ~3.5ms scalar
    # permutation even for a single row — recursion circuits have many
    # levels with only 1-3 PoseidonGates (sequential Merkle path chains)
    BATCH_MIN = 1

    def __init__(self, row: int):
        self.row = row

    def dependencies(self):
        return [Wire(self.row, PoseidonGate.wire_input(i)) for i in range(W)] + [
            Wire(self.row, PoseidonGate.WIRE_SWAP)
        ]

    def outputs(self):
        P = PoseidonGate
        outs = [Wire(self.row, P.wire_delta(i)) for i in range(4)]
        for r in range(1, HALF_N_FULL_ROUNDS):
            outs += [Wire(self.row, P.wire_full_sbox_0(r, i)) for i in range(W)]
        outs += [Wire(self.row, P.wire_partial_sbox(r))
                 for r in range(N_PARTIAL_ROUNDS)]
        for r in range(HALF_N_FULL_ROUNDS):
            outs += [Wire(self.row, P.wire_full_sbox_1(r, i)) for i in range(W)]
        outs += [Wire(self.row, P.wire_output(i)) for i in range(W)]
        return outs

    @classmethod
    def run_batch(cls, gens, witness):
        """All rows of the batch at once: the same ops-generic layer code as
        run_once, on numpy u64 row-vectors (NumpyBaseOps). One permutation's
        worth of Python ops serves every PoseidonGate in the level."""
        import numpy as np

        from plonky2_tpu.field import np_field as npf
        from plonky2_tpu.gates.ops import NumpyBaseOps

        n = len(gens)
        rows = np.fromiter((g.row for g in gens), np.int64, n)

        def wreps(col):
            return witness.wire_reps(rows, col)

        # one 2D gather for all input columns (per-column calls paid numpy
        # setup 13+122 times per level batch — the dominant witness cost in
        # recursion circuits, which have many small Poseidon levels)
        in_cols = np.asarray([PoseidonGate.wire_input(i) for i in range(W)]
                             + [PoseidonGate.WIRE_SWAP], np.int64)
        in_vals = witness.get_reps(witness.wire_reps(rows[:, None],
                                                     in_cols[None, :]))
        inputs = [in_vals[:, i] for i in range(W)]
        swap = in_vals[:, W]
        assert bool(((swap == 0) | (swap == 1)).all()), "swap must be 0 or 1"

        from plonky2_tpu import native

        if native.available:
            # one C call fills every intermediate wire of every row
            out_vals = native.poseidon_gate_witness(
                np.stack(inputs, axis=1), swap)  # [n, 122]
            global _OUT_COLS_NP
            if _OUT_COLS_NP is None:  # same layout every row
                _OUT_COLS_NP = np.asarray(
                    [t.column for t in gens[0].outputs()], np.int64)
            all_reps = witness.wire_reps(rows[:, None], _OUT_COLS_NP[None, :])
            witness.set_reps(all_reps.T.reshape(-1), out_vals.T.reshape(-1))
            return

        write_cols: list[int] = []
        write_vals: list[np.ndarray] = []

        def put(col, vals):
            write_cols.append(col)
            write_vals.append(vals)

        for i in range(4):
            put(PoseidonGate.wire_delta(i),
                npf.mul(swap, npf.sub(inputs[i + 4], inputs[i])))

        do_swap = swap == 1
        state = list(inputs)
        for i in range(4):
            a, b = state[i], state[i + 4]
            state[i] = np.where(do_swap, b, a)
            state[i + 4] = np.where(do_swap, a, b)

        ops = NumpyBaseOps()
        round_ctr = 0
        for r in range(HALF_N_FULL_ROUNDS):
            state = constant_layer(ops, state, round_ctr)
            if r != 0:
                for i in range(W):
                    put(PoseidonGate.wire_full_sbox_0(r, i), state[i])
            state = sbox_layer(ops, state)
            state = mds_layer(ops, state)
            round_ctr += 1

        state = partial_first_constant_layer(ops, state)
        state = mds_partial_layer_init(ops, state)
        for r in range(N_PARTIAL_ROUNDS - 1):
            put(PoseidonGate.wire_partial_sbox(r), state[0])
            s0 = sbox_monomial(ops, state[0])
            s0 = ops.add_const(s0, FAST_PARTIAL_ROUND_CONSTANTS[r])
            state = mds_partial_layer_fast(ops, [s0] + state[1:], r)
        put(PoseidonGate.wire_partial_sbox(N_PARTIAL_ROUNDS - 1), state[0])
        s0 = sbox_monomial(ops, state[0])
        state = mds_partial_layer_fast(ops, [s0] + state[1:], N_PARTIAL_ROUNDS - 1)
        round_ctr += N_PARTIAL_ROUNDS

        for r in range(HALF_N_FULL_ROUNDS):
            state = constant_layer(ops, state, round_ctr)
            for i in range(W):
                put(PoseidonGate.wire_full_sbox_1(r, i), state[i])
            state = sbox_layer(ops, state)
            state = mds_layer(ops, state)
            round_ctr += 1

        for i in range(W):
            put(PoseidonGate.wire_output(i), state[i])

        all_reps = np.concatenate([wreps(c) for c in write_cols])
        all_vals = np.concatenate(
            [np.broadcast_to(np.asarray(v, np.uint64), (n,)) for v in write_vals])
        witness.set_reps(all_reps, all_vals)

    def run_once(self, witness, out):
        ops = HostBaseOps()
        row = self.row
        w = lambda col: witness.get_target(Wire(row, col))

        inputs = [w(PoseidonGate.wire_input(i)) for i in range(W)]
        swap = w(PoseidonGate.WIRE_SWAP)
        assert swap in (0, 1)

        for i in range(4):
            delta = fs.mul(swap, fs.sub(inputs[i + 4], inputs[i]))
            out.set_target(Wire(row, PoseidonGate.wire_delta(i)), delta)

        if swap == 1:
            for i in range(4):
                inputs[i], inputs[i + 4] = inputs[i + 4], inputs[i]

        state = list(inputs)
        round_ctr = 0
        for r in range(HALF_N_FULL_ROUNDS):
            state = constant_layer(ops, state, round_ctr)
            if r != 0:
                for i in range(W):
                    out.set_target(Wire(row, PoseidonGate.wire_full_sbox_0(r, i)), state[i])
            state = sbox_layer(ops, state)
            state = mds_layer(ops, state)
            round_ctr += 1

        state = partial_first_constant_layer(ops, state)
        state = mds_partial_layer_init(ops, state)
        for r in range(N_PARTIAL_ROUNDS - 1):
            out.set_target(Wire(row, PoseidonGate.wire_partial_sbox(r)), state[0])
            s0 = sbox_monomial(ops, state[0])
            s0 = ops.add_const(s0, FAST_PARTIAL_ROUND_CONSTANTS[r])
            state = mds_partial_layer_fast(ops, [s0] + state[1:], r)
        out.set_target(
            Wire(row, PoseidonGate.wire_partial_sbox(N_PARTIAL_ROUNDS - 1)), state[0]
        )
        s0 = sbox_monomial(ops, state[0])
        state = mds_partial_layer_fast(ops, [s0] + state[1:], N_PARTIAL_ROUNDS - 1)
        round_ctr += N_PARTIAL_ROUNDS

        for r in range(HALF_N_FULL_ROUNDS):
            state = constant_layer(ops, state, round_ctr)
            for i in range(W):
                out.set_target(Wire(row, PoseidonGate.wire_full_sbox_1(r, i)), state[i])
            state = sbox_layer(ops, state)
            state = mds_layer(ops, state)
            round_ctr += 1

        for i in range(W):
            out.set_target(Wire(row, PoseidonGate.wire_output(i)), state[i])
