"""Cross-table lookups (reference starky/src/cross_table_lookup.rs).

A CrossTableLookup asserts the filtered multiset of column combinations in
the looking tables equals the looked table's. Each table carries logUp-style
partial-sum Z columns; the verifier checks that the sums of looking
`ctl_zs_first` openings (Z evaluated at 1) match the looked table's.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.starky.lookup import (
    Filter,
    GrandProductChallenge,
    GrandProductChallengeSet,
    eval_helper_columns,
    get_grand_product_challenge_set,
    get_helper_cols,
)


@dataclass
class TableWithColumns:
    table: int  # table index within the multi-table system
    columns: list  # [Column]
    filter: Filter


@dataclass
class CrossTableLookup:
    looking_tables: list  # [TableWithColumns]
    looked_table: TableWithColumns


@dataclass
class CtlZData:
    helper_columns: list  # [np [n]]
    z: np.ndarray
    challenge: GrandProductChallenge
    columns: list  # per looking group, list[Column]
    filter: list  # per looking group, Filter


@dataclass
class CtlData:
    zs_columns: list = field(default_factory=list)

    def num_ctl_helper_polys(self) -> list[int]:
        return [len(z.helper_columns) for z in self.zs_columns]

    def ctl_helper_polys(self) -> list[np.ndarray]:
        return [h for z in self.zs_columns for h in z.helper_columns]

    def ctl_z_polys(self) -> list[np.ndarray]:
        return [z.z for z in self.zs_columns]


def partial_sums(trace, columns_filters, challenge, constraint_degree):
    """Helper columns + reverse-prefix-sum Z column
    (reference cross_table_lookup.rs:383-415)."""
    degree = trace.shape[1]
    helper_columns = get_helper_cols(trace, columns_filters, challenge, constraint_degree)
    z = np.zeros(degree, dtype=np.uint64)
    acc = 0
    for i in range(degree - 1, -1, -1):
        x = 0
        for h in helper_columns:
            x = fs.add(x, int(h[i]))
        acc = fs.add(acc, x)
        z[i] = acc
    if len(columns_filters) > 1:
        return helper_columns + [z]
    return [z]


def cross_table_lookup_data(trace_per_table: list, cross_table_lookups: list,
                            ctl_challenges, constraint_degree: int) -> list:
    """Per-table CtlData (reference cross_table_lookup.rs:270-341)."""
    ctl_data_per_table = [CtlData() for _ in trace_per_table]
    for ctl in cross_table_lookups:
        for challenge in ctl_challenges.challenges:
            # looking side: group looking tables by table index
            tables_seen = []
            for t in ctl.looking_tables:
                if t.table not in tables_seen:
                    tables_seen.append(t.table)
            for table in tables_seen:
                groups = [(lt.columns, lt.filter) for lt in ctl.looking_tables
                          if lt.table == table]
                helpers_zs = partial_sums(
                    trace_per_table[table], groups, challenge, constraint_degree
                )
                ctl_data_per_table[table].zs_columns.append(CtlZData(
                    helper_columns=helpers_zs[:-1],
                    z=helpers_zs[-1],
                    challenge=challenge,
                    columns=[g[0] for g in groups],
                    filter=[g[1] for g in groups],
                ))
            # looked side: never has helper columns
            lt = ctl.looked_table
            z_looked = partial_sums(
                trace_per_table[lt.table], [(lt.columns, lt.filter)],
                challenge, constraint_degree,
            )
            ctl_data_per_table[lt.table].zs_columns.append(CtlZData(
                helper_columns=[], z=z_looked[0], challenge=challenge,
                columns=[lt.columns], filter=[lt.filter],
            ))
    return ctl_data_per_table


def ctl_shape_data(num_tables: int, cross_table_lookups, ctl_challenges,
                   constraint_degree: int) -> list:
    """CtlData with the same structure (helper counts, challenges, columns,
    filters) as cross_table_lookup_data but WITHOUT computing any values —
    what the verifier needs to slice openings."""
    chunk = max(constraint_degree - 1, 1)
    out = [CtlData() for _ in range(num_tables)]
    for ctl in cross_table_lookups:
        for challenge in ctl_challenges.challenges:
            tables_seen = []
            for t in ctl.looking_tables:
                if t.table not in tables_seen:
                    tables_seen.append(t.table)
            for table in tables_seen:
                groups = [(lt.columns, lt.filter) for lt in ctl.looking_tables
                          if lt.table == table]
                num_helpers = -(-len(groups) // chunk) if len(groups) > 1 else 0
                out[table].zs_columns.append(CtlZData(
                    helper_columns=[None] * num_helpers, z=None,
                    challenge=challenge,
                    columns=[g[0] for g in groups], filter=[g[1] for g in groups],
                ))
            lt = ctl.looked_table
            out[lt.table].zs_columns.append(CtlZData(
                helper_columns=[], z=None, challenge=challenge,
                columns=[lt.columns], filter=[lt.filter],
            ))
    return out


def get_ctl_data(config, trace_per_table, cross_table_lookups, challenger,
                 max_constraint_degree: int):
    ctl_challenges = get_grand_product_challenge_set(challenger, config.num_challenges)
    ctl_data = cross_table_lookup_data(
        trace_per_table, cross_table_lookups, ctl_challenges, max_constraint_degree
    )
    return ctl_challenges, ctl_data


def get_ctl_auxiliary_polys(ctl_data: CtlData | None):
    if ctl_data is None:
        return None
    return ctl_data.ctl_helper_polys() + ctl_data.ctl_z_polys()


@dataclass
class CtlCheckVars:
    """Openings view for one Z column's checks (ops-domain values)."""

    helper_columns: list
    local_z: object
    next_z: object
    challenges: GrandProductChallenge
    columns: list
    filter: list

    @staticmethod
    def from_proof(ctl_zs_data, aux_openings, aux_next_openings,
                   num_lookup_columns: int, num_helpers_per_z: list[int]):
        """Slice a table's aux openings into per-Z check vars."""
        out = []
        total_helpers = sum(num_helpers_per_z)
        start = num_lookup_columns
        z_start = num_lookup_columns + total_helpers
        for i, zdata in enumerate(ctl_zs_data):
            k = num_helpers_per_z[i]
            out.append(CtlCheckVars(
                helper_columns=aux_openings[start:start + k],
                local_z=aux_openings[z_start + i],
                next_z=aux_next_openings[z_start + i],
                challenges=zdata.challenge,
                columns=zdata.columns,
                filter=zdata.filter,
            ))
            start += k
        return out


def eval_cross_table_lookup_checks(ops, frame, ctl_vars: list, consumer,
                                   constraint_degree: int) -> None:
    """ops-generic CTL constraints (reference cross_table_lookup.rs:558-631)."""
    local = frame.get_local_values()
    nxt = frame.get_next_values()

    def chal(v):
        # int in the native/device flows; a base Target in-circuit
        if isinstance(v, int):
            return ops.constant(v)
        lift = getattr(ops, "from_base_target", None)
        return lift(v) if lift else v

    for lv in ctl_vars:
        beta = chal(lv.challenges.beta)
        gamma = chal(lv.challenges.gamma)
        evals = [
            [c.eval(ops, local, nxt) for c in group] for group in lv.columns
        ]

        def combine(group_evals):
            acc = ops.zero()
            for e in reversed(group_evals):
                acc = ops.add(ops.mul(beta, acc), e)
            return ops.add(acc, gamma)

        eval_helper_columns(
            ops, lv.filter, evals, local, nxt, lv.helper_columns,
            constraint_degree, (beta, gamma), consumer,
        )

        if lv.helper_columns:
            h_sum = ops.zero()
            for h in lv.helper_columns:
                h_sum = ops.add(h_sum, h)
            consumer.constraint_last_row(ops.sub(lv.local_z, h_sum))
            consumer.constraint_transition(
                ops.sub(ops.sub(lv.local_z, lv.next_z), h_sum)
            )
        elif len(lv.columns) > 1:
            combin0 = combine(evals[0])
            combin1 = combine(evals[1])
            f0 = lv.filter[0].eval_filter(ops, local, nxt)
            f1 = lv.filter[1].eval_filter(ops, local, nxt)
            prod = ops.mul(combin0, combin1)
            rhs = ops.add(ops.mul(f0, combin1), ops.mul(f1, combin0))
            consumer.constraint_last_row(ops.sub(ops.mul(prod, lv.local_z), rhs))
            consumer.constraint_transition(
                ops.sub(ops.mul(prod, ops.sub(lv.local_z, lv.next_z)), rhs)
            )
        else:
            combin0 = combine(evals[0])
            f0 = lv.filter[0].eval_filter(ops, local, nxt)
            consumer.constraint_last_row(ops.sub(ops.mul(combin0, lv.local_z), f0))
            consumer.constraint_transition(
                ops.sub(ops.mul(combin0, ops.sub(lv.local_z, lv.next_z)), f0)
            )


def verify_cross_table_lookups(cross_table_lookups, ctl_zs_first: list,
                               config, ctl_extra_looking_sums=None) -> None:
    """Sum of looking ctl_zs_first == looked ctl_zs_first per CTL per
    challenge (reference cross_table_lookup.rs:852-902)."""
    ctl_extra_looking_sums = ctl_extra_looking_sums or {}
    iters = [iter(v) for v in ctl_zs_first]
    for index, ctl in enumerate(cross_table_lookups):
        filtered = []
        for t in ctl.looking_tables:
            if t.table not in filtered:
                filtered.append(t.table)
        for c in range(config.num_challenges):
            looking_sum = 0
            for table in filtered:
                looking_sum = fs.add(looking_sum, next(iters[table]))
            extra = ctl_extra_looking_sums.get(index)
            if extra is not None:
                looking_sum = fs.add(looking_sum, extra[c])
            looked = next(iters[ctl.looked_table.table])
            if looking_sum != looked:
                raise ValueError(f"Cross-table lookup {index} verification failed.")
    for it in iters:
        assert next(it, None) is None, "unconsumed ctl_zs_first openings"


def check_ctls(trace_per_table, cross_table_lookups) -> None:
    """Debug-only exhaustive multiset check
    (reference cross_table_lookup.rs:969+)."""
    for index, ctl in enumerate(cross_table_lookups):
        looking = []
        for t in ctl.looking_tables:
            trace = trace_per_table[t.table]
            filt = t.filter.eval_all_rows(trace)
            cols = [c.eval_all_rows(trace) for c in t.columns]
            for r in range(trace.shape[1]):
                if int(filt[r]):
                    looking.append(tuple(int(c[r]) for c in cols))
        looked = []
        t = ctl.looked_table
        trace = trace_per_table[t.table]
        filt = t.filter.eval_all_rows(trace)
        cols = [c.eval_all_rows(trace) for c in t.columns]
        for r in range(trace.shape[1]):
            if int(filt[r]):
                looked.append(tuple(int(c[r]) for c in cols))
        assert sorted(looking) == sorted(looked), f"CTL {index} multiset mismatch"


# -- multi-table driver -------------------------------------------------------
# The reference keeps multi-STARK orchestration out of tree (zkEVM); this is
# the TPU framework's equivalent: one transcript over all tables.


def prove_multi_table(starks, config, traces, public_inputs_per_table,
                      cross_table_lookups):
    """Prove several STARK tables under one transcript with CTLs."""
    import numpy as np

    from plonky2_tpu.fri.oracle import PolynomialBatch
    from plonky2_tpu.iop.challenger import Challenger
    from plonky2_tpu.starky.prover import prove_with_commitment
    from plonky2_tpu.util import TimingTree

    traces = [np.asarray(t, dtype=np.uint64) for t in traces]
    rate_bits = config.fri_config.rate_bits
    cap_height = config.fri_config.cap_height

    challenger = Challenger()
    config.observe(challenger)
    commitments = []
    for pis, trace in zip(public_inputs_per_table, traces):
        challenger.observe_elements(pis)
        c = PolynomialBatch.from_values(trace, rate_bits, False, cap_height)
        challenger.observe_cap(c.merkle_tree.cap)
        commitments.append(c)

    max_degree = max(s.constraint_degree() for s in starks)
    ctl_challenges, ctl_data = get_ctl_data(
        config, traces, cross_table_lookups, challenger, max_degree
    )

    proofs = []
    for i, stark in enumerate(starks):
        proofs.append(prove_with_commitment(
            stark, config, traces[i], commitments[i], challenger,
            public_inputs_per_table[i], None, None, TimingTree(f"table {i}"),
            ctl_data=ctl_data[i], ctl_challenges=ctl_challenges,
        ))
    return proofs, ctl_challenges


def get_multi_proof_challenges(starks, config, proofs, cross_table_lookups):
    """All Fiat-Shamir challenges of a multi-table proof under the shared
    transcript (reference starky/src/proof.rs MultiProofChallenges +
    get_challenges with ignore_trace_cap semantics, get_challenges.rs:270).

    Returns (MultiProofChallenges, ctl_desc) where ctl_desc carries the
    per-table CTL shape descriptors needed to build CtlCheckVars."""
    from plonky2_tpu.iop.challenger import Challenger
    from plonky2_tpu.starky.get_challenges import get_challenges
    from plonky2_tpu.starky.proof import MultiProofChallenges

    challenger = Challenger()
    config.observe(challenger)
    for pwp in proofs:
        challenger.observe_elements(pwp.public_inputs)
        challenger.observe_cap(pwp.proof.trace_cap)
    ctl_challenges = get_grand_product_challenge_set(challenger, config.num_challenges)

    # per-table CTL descriptors (shape + challenges only; no values needed)
    ctl_desc = ctl_shape_data(
        len(starks), cross_table_lookups, ctl_challenges,
        max(s.constraint_degree() for s in starks),
    )

    stark_challenges = []
    for i, (stark, pwp) in enumerate(zip(starks, proofs)):
        num_helpers_per_z = [len(z.helper_columns) for z in ctl_desc[i].zs_columns]
        stark_challenges.append(get_challenges(
            stark, pwp, config, challenger=challenger, observe_instance=False,
            ctl_challenge_set=ctl_challenges,
            ctl_zs_data=ctl_desc[i].zs_columns,
            num_ctl_helpers_per_z=num_helpers_per_z,
        ))

    return (MultiProofChallenges(stark_challenges=stark_challenges,
                                 ctl_challenges=ctl_challenges), ctl_desc)


def verify_multi_table(starks, config, proofs, cross_table_lookups) -> None:
    """Replay the shared transcript, verify each table with its CTL vars,
    then check the cross-table sums."""
    from plonky2_tpu.starky.verifier import verify_stark_proof_with_challenges

    multi_challenges, ctl_desc = get_multi_proof_challenges(
        starks, config, proofs, cross_table_lookups)

    ctl_zs_first = []
    for i, (stark, pwp) in enumerate(zip(starks, proofs)):
        num_helpers_per_z = [len(z.helper_columns) for z in ctl_desc[i].zs_columns]
        num_lookup_columns = stark.num_lookup_helper_columns(config)
        ctl_vars = CtlCheckVars.from_proof(
            ctl_desc[i].zs_columns,
            pwp.proof.openings.auxiliary_polys,
            pwp.proof.openings.auxiliary_polys_next,
            num_lookup_columns, num_helpers_per_z,
        )
        verify_stark_proof_with_challenges(
            stark, pwp.proof, multi_challenges.stark_challenges[i],
            pwp.public_inputs, config, ctl_vars=ctl_vars,
        )
        ctl_zs_first.append(list(pwp.proof.openings.ctl_zs_first or []))

    verify_cross_table_lookups(cross_table_lookups, ctl_zs_first, config)


# -- in-circuit multi-table verification --------------------------------------


def verify_cross_table_lookups_circuit(builder, cross_table_lookups,
                                       ctl_zs_first_t: list, config) -> None:
    """Circuit dual of verify_cross_table_lookups: Σ looking ctl_zs_first ==
    looked ctl_zs_first (reference cross_table_lookup.rs
    verify_cross_table_lookups_circuit)."""
    iters = [iter(v) for v in ctl_zs_first_t]
    for ctl in cross_table_lookups:
        filtered = []
        for t in ctl.looking_tables:
            if t.table not in filtered:
                filtered.append(t.table)
        for _ in range(config.num_challenges):
            s = builder.zero()
            for table in filtered:
                s = builder.add(s, next(iters[table]))
            looked = next(iters[ctl.looked_table.table])
            builder.connect(s, looked)


def verify_multi_table_circuit(builder, starks, config, proof_ts,
                               cross_table_lookups,
                               degree_bits_per_table: list[int]) -> None:
    """Verify ALL tables' STARK proofs inside one plonky2 circuit with a
    shared in-circuit transcript and CTL challenges — the circuit dual of
    verify_multi_table (the reference keeps this orchestration out of tree;
    its single-table surface is verify_stark_proof_with_challenges_circuit
    with ctl_vars)."""
    from plonky2_tpu.recursion.recursive_challenger import RecursiveChallenger
    from plonky2_tpu.starky.recursive_verifier import (
        _get_challenges_target,
        _observe_stark_config,
        verify_stark_proof_with_challenges_circuit,
    )

    challenger = RecursiveChallenger(builder)
    _observe_stark_config(builder, challenger, config)
    for pt in proof_ts:
        challenger.observe_elements(pt.public_inputs)
        challenger.observe_cap(pt.proof.trace_cap)
    ctl_challenges = GrandProductChallengeSet(challenges=[
        GrandProductChallenge(challenger.get_challenge(), challenger.get_challenge())
        for _ in range(config.num_challenges)
    ])
    ctl_desc = ctl_shape_data(
        len(starks), cross_table_lookups, ctl_challenges,
        max(s.constraint_degree() for s in starks),
    )

    ctl_zs_first_t = []
    for i, (stark, pt) in enumerate(zip(starks, proof_ts)):
        num_helpers_per_z = [len(z.helper_columns) for z in ctl_desc[i].zs_columns]
        num_lookup_columns = stark.num_lookup_helper_columns(config)
        challenges = _get_challenges_target(
            builder, stark, pt, config, degree_bits_per_table[i],
            challenger=challenger, observe_instance=False,
            ctl_challenge_set=ctl_challenges,
            ctl_zs_data=ctl_desc[i].zs_columns,
            num_ctl_helpers_per_z=num_helpers_per_z,
        )
        ctl_vars = CtlCheckVars.from_proof(
            ctl_desc[i].zs_columns,
            pt.proof.openings.auxiliary_polys,
            pt.proof.openings.auxiliary_polys_next,
            num_lookup_columns, num_helpers_per_z,
        )
        verify_stark_proof_with_challenges_circuit(
            builder, stark, pt.proof, pt.public_inputs, challenges, config,
            degree_bits_per_table[i], ctl_vars=ctl_vars,
        )
        ctl_zs_first_t.append(list(pt.proof.openings.ctl_zs_first or []))

    verify_cross_table_lookups_circuit(builder, cross_table_lookups,
                                       ctl_zs_first_t, config)
