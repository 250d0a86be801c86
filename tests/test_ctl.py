"""Cross-table lookups: two STARK tables, one looking into the other
(reference starky cross_table_lookup.rs)."""

import numpy as np
import pytest

from plonky2_tpu.starky.config import StarkConfig
from plonky2_tpu.starky.cross_table_lookup import (
    CrossTableLookup,
    TableWithColumns,
    check_ctls,
    prove_multi_table,
    verify_multi_table,
)
from plonky2_tpu.starky.lookup import Column, Filter
from plonky2_tpu.starky.stark import Stark


class TableA(Stark):
    """Column 0 holds values that must all appear (as a multiset) in B."""

    COLUMNS = 1
    PUBLIC_INPUTS = 0

    def __init__(self, values):
        self.values = values

    def generate_trace(self):
        return np.asarray([self.values], dtype=np.uint64)

    def eval(self, ops, frame, consumer):
        pass

    def constraint_degree(self):
        return 3

    def requires_ctls(self):
        return True


class TableB(TableA):
    pass


@pytest.fixture(scope="module")
def ctl_setup():
    n = 16
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 100, size=n).astype(np.uint64)
    perm = rng.permutation(n)
    a = TableA(list(vals))
    b = TableB(list(vals[perm]))
    ctls = [CrossTableLookup(
        looking_tables=[TableWithColumns(0, [Column.single(0)], Filter.default())],
        looked_table=TableWithColumns(1, [Column.single(0)], Filter.default()),
    )]
    return a, b, ctls


def test_check_ctls_debug(ctl_setup):
    a, b, ctls = ctl_setup
    check_ctls([a.generate_trace(), b.generate_trace()], ctls)


def test_ctl_prove_verify(ctl_setup):
    a, b, ctls = ctl_setup
    config = StarkConfig.standard_fast_config()
    traces = [a.generate_trace(), b.generate_trace()]
    proofs, _ = prove_multi_table([a, b], config, traces, [[], []], ctls)
    verify_multi_table([a, b], config, proofs, ctls)


def test_ctl_mismatch_rejected(ctl_setup):
    a, b, ctls = ctl_setup
    config = StarkConfig.standard_fast_config()
    bad_b = TableB(list(np.asarray(b.values, dtype=np.uint64) + np.uint64(1)))
    traces = [a.generate_trace(), bad_b.generate_trace()]
    with pytest.raises(Exception):
        proofs, _ = prove_multi_table([a, bad_b], config, traces, [[], []], ctls)
        verify_multi_table([a, bad_b], config, proofs, ctls)


def test_ctl_recursive_multi_table(ctl_setup):
    """Both tables' proofs + the cross-table sum check verified inside ONE
    plonky2 circuit (circuit dual of verify_multi_table; the reference's
    in-tree surface is verify_stark_proof_with_challenges_circuit with
    ctl_vars)."""
    from plonky2_tpu.iop.witness import PartialWitness
    from plonky2_tpu.plonk.circuit_builder import CircuitBuilder
    from plonky2_tpu.plonk.config import CircuitConfig
    from plonky2_tpu.starky.cross_table_lookup import (
        ctl_shape_data,
        verify_multi_table_circuit,
    )
    from plonky2_tpu.starky.lookup import (
        GrandProductChallenge,
        GrandProductChallengeSet,
    )
    from plonky2_tpu.starky.recursive_verifier import (
        add_virtual_stark_proof_with_pis,
        set_stark_proof_with_pis_target,
    )
    from plonky2_tpu.util import log2_strict

    a, b, ctls = ctl_setup
    starks = [a, b]
    config = StarkConfig.standard_fast_config()
    traces = [a.generate_trace(), b.generate_trace()]
    proofs, _ = prove_multi_table(starks, config, traces, [[], []], ctls)
    verify_multi_table(starks, config, proofs, ctls)
    degree_bits = [log2_strict(t.shape[1]) for t in traces]

    # shape-only CTL descriptor to size the per-table aux/ctl_zs targets
    dummy_chals = GrandProductChallengeSet(challenges=[
        GrandProductChallenge(0, 0) for _ in range(config.num_challenges)])
    desc = ctl_shape_data(len(starks), ctls,
                          dummy_chals, max(s.constraint_degree() for s in starks))

    builder = CircuitBuilder(CircuitConfig.standard_recursion_config())
    pts = []
    for i, stark in enumerate(starks):
        num_helper_zs = (sum(len(z.helper_columns) for z in desc[i].zs_columns)
                         + len(desc[i].zs_columns))
        pts.append(add_virtual_stark_proof_with_pis(
            builder, stark, config, degree_bits[i],
            num_ctl_helper_zs=num_helper_zs,
            num_ctl_zs=len(desc[i].zs_columns)))
    verify_multi_table_circuit(builder, starks, config, pts, ctls, degree_bits)
    data = builder.build()

    pw = PartialWitness()
    for pt, pf in zip(pts, proofs):
        set_stark_proof_with_pis_target(pw, pt, pf)
    proof = data.prove(pw)
    data.verify(proof)


def test_multi_proof_challenges_api(ctl_setup):
    """MultiProofChallenges surface (reference starky/src/proof.rs:196-202):
    per-table challenges + the shared CTL challenge set, consistent with the
    driver's own transcript."""
    from plonky2_tpu.starky.cross_table_lookup import get_multi_proof_challenges
    from plonky2_tpu.starky.proof import MultiProofChallenges

    a, b, ctls = ctl_setup
    starks = [a, b]
    config = StarkConfig.standard_fast_config()
    traces = [a.generate_trace(), b.generate_trace()]
    proofs, _ = prove_multi_table(starks, config, traces, [[], []], ctls)
    mc, ctl_desc = get_multi_proof_challenges(starks, config, proofs, ctls)
    assert isinstance(mc, MultiProofChallenges)
    assert len(mc.stark_challenges) == len(starks)
    assert len(mc.ctl_challenges.challenges) == config.num_challenges
    assert len(ctl_desc) == len(starks)
    # zetas are per-table (independent draws from the shared transcript)
    zetas = [c.stark_zeta for c in mc.stark_challenges]
    assert len(set(zetas)) == len(zetas)
