"""PoseidonMdsGate: one MDS layer over extension-algebra state
(reference gates/poseidon_mds.rs)."""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.gates.gate import Gate
from plonky2_tpu.gates.ops import ealg_add, ealg_sub, ealg_zero
from plonky2_tpu.hash.poseidon_constants import (
    MDS_MATRIX_CIRC,
    MDS_MATRIX_DIAG,
    SPONGE_WIDTH,
)
from plonky2_tpu.iop.generator import SimpleGenerator
from plonky2_tpu.iop.target import ExtensionTarget, Wire

D = 2
W = SPONGE_WIDTH


class PoseidonMdsGate(Gate):
    @staticmethod
    def wires_input(i: int) -> range:
        return range(i * D, (i + 1) * D)

    @staticmethod
    def wires_output(i: int) -> range:
        return range((W + i) * D, (W + i + 1) * D)

    def id(self) -> str:
        return f"PoseidonMdsGate(PhantomData<plonky2_field::goldilocks_field::GoldilocksField>)<WIDTH={W}>"

    @staticmethod
    def _mds_row_shf_algebra(ops, r, v):
        res = ealg_zero(ops, D)
        for i in range(W):
            coeff = MDS_MATRIX_CIRC[i]
            term = tuple(ops.mul_const(coeff, x) for x in v[(i + r) % W])
            res = ealg_add(ops, res, term)
        coeff = MDS_MATRIX_DIAG[r]
        term = tuple(ops.mul_const(coeff, x) for x in v[r])
        return ealg_add(ops, res, term)

    def eval_unfiltered(self, ops, vars) -> list:
        inputs = [vars.get_local_ext_algebra(self.wires_input(i)) for i in range(W)]
        constraints = []
        for r in range(W):
            computed = self._mds_row_shf_algebra(ops, r, inputs)
            out = vars.get_local_ext_algebra(self.wires_output(r))
            constraints.extend(ealg_sub(ops, computed, out))
        return constraints

    def eval_unfiltered_device(self, wires, constants, public_inputs_hash):
        """Tensorized: the MDS layer acts on each extension component
        independently (base-field coefficients), so both components go
        through one [W, W] modular mat-vec (same values/order)."""
        import numpy as np
        import jax.numpy as jnp

        from plonky2_tpu.field import goldilocks as g
        from plonky2_tpu.field import scalar as fs

        m = np.empty((W, W), dtype=np.uint64)
        for r in range(W):
            for j in range(W):
                m[r, j] = MDS_MATRIX_CIRC[(j - r) % W] % fs.P
            m[r, r] = (int(m[r, r]) + MDS_MATRIX_DIAG[r]) % fs.P
        comp = wires[:W * D].reshape(W, D, wires.shape[-1])
        outs = wires[W * D:2 * W * D].reshape(W, D, wires.shape[-1])
        # matmul_mod is [W, c] x [c, Q]; run each extension component through it
        computed = jnp.stack(
            [g.matmul_mod(jnp.asarray(m), comp[:, k]) for k in range(D)], axis=1)
        return g.sub(computed, outs).reshape(W * D, wires.shape[-1])

    def generators(self, row: int, local_constants) -> list:
        return [PoseidonMdsGenerator(row)]

    def num_wires(self) -> int:
        return 2 * D * W

    def num_constants(self) -> int:
        return 0

    def degree(self) -> int:
        return 1

    def num_constraints(self) -> int:
        return W * D


class PoseidonMdsGenerator(SimpleGenerator):
    def __init__(self, row: int):
        self.row = row

    def dependencies(self):
        return [
            Wire(self.row, w)
            for i in range(W)
            for w in PoseidonMdsGate.wires_input(i)
        ]

    def outputs(self):
        return [
            Wire(self.row, w)
            for r in range(W)
            for w in PoseidonMdsGate.wires_output(r)
        ]

    def run_once(self, witness, out):
        row = self.row
        inputs = [
            tuple(witness.get_target(Wire(row, w)) for w in PoseidonMdsGate.wires_input(i))
            for i in range(W)
        ]
        for r in range(W):
            acc = fs.ext_zero(D)
            for i in range(W):
                acc = fs.ext_add(acc, fs.ext_scalar_mul(MDS_MATRIX_CIRC[i], inputs[(i + r) % W]))
            acc = fs.ext_add(acc, fs.ext_scalar_mul(MDS_MATRIX_DIAG[r], inputs[r]))
            out.set_extension_target(
                ExtensionTarget(tuple(Wire(row, w) for w in PoseidonMdsGate.wires_output(r))),
                acc,
            )
