"""logUp lookups for starky (reference starky/src/lookup.rs).

`Column`/`Filter` form a linear-combination DSL over trace cells (including
next-row references); `Lookup` ties looking columns to a table column with a
frequencies column. Helper columns are batched 1/(x+challenge) sums; the Z
column accumulates sum(h_i) - m/(t+challenge), which must telescope to zero.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from plonky2_tpu.field import scalar as fs


@dataclass
class Column:
    linear_combination: list = field(default_factory=list)  # [(col, coeff)]
    next_row_linear_combination: list = field(default_factory=list)
    constant: int = 0

    @staticmethod
    def single(c: int) -> "Column":
        return Column(linear_combination=[(c, 1)])

    @staticmethod
    def singles(cs) -> list:
        return [Column.single(c) for c in cs]

    @staticmethod
    def single_next_row(c: int) -> "Column":
        return Column(next_row_linear_combination=[(c, 1)])

    @staticmethod
    def constant_col(k: int) -> "Column":
        return Column(constant=k % fs.P)

    @staticmethod
    def zero() -> "Column":
        return Column.constant_col(0)

    @staticmethod
    def one() -> "Column":
        return Column.constant_col(1)

    @staticmethod
    def linear_combination_with_constant(pairs, constant: int) -> "Column":
        return Column(linear_combination=list(pairs), constant=constant % fs.P)

    def eval(self, ops, local, nxt):
        """ops-domain evaluation at a row."""
        acc = ops.constant(self.constant)
        for c, coeff in self.linear_combination:
            acc = ops.add(acc, ops.mul_const(coeff, local[c]))
        for c, coeff in self.next_row_linear_combination:
            acc = ops.add(acc, ops.mul_const(coeff, nxt[c]))
        return acc

    def eval_all_rows(self, trace: np.ndarray) -> np.ndarray:
        """Host evaluation over every row. trace: [cols, n] u64."""
        n = trace.shape[1]
        acc = np.full(n, self.constant, dtype=object)
        for c, coeff in self.linear_combination:
            acc = (acc + coeff * trace[c].astype(object)) % fs.P
        for c, coeff in self.next_row_linear_combination:
            acc = (acc + coeff * np.roll(trace[c], -1).astype(object)) % fs.P
        return acc.astype(np.uint64)


@dataclass
class Filter:
    products: list = field(default_factory=list)  # [(Column, Column)]
    constants: list = field(default_factory=list)  # [Column]

    @staticmethod
    def default() -> "Filter":
        return Filter(constants=[Column.one()])

    @staticmethod
    def new_simple(col: Column) -> "Filter":
        return Filter(constants=[col])

    def eval_filter(self, ops, local, nxt):
        acc = ops.zero()
        for a, b in self.products:
            acc = ops.add(acc, ops.mul(a.eval(ops, local, nxt), b.eval(ops, local, nxt)))
        for c in self.constants:
            acc = ops.add(acc, c.eval(ops, local, nxt))
        return acc

    def eval_all_rows(self, trace: np.ndarray) -> np.ndarray:
        n = trace.shape[1]
        acc = np.zeros(n, dtype=object)
        for a, b in self.products:
            acc = (acc + a.eval_all_rows(trace).astype(object)
                   * b.eval_all_rows(trace).astype(object)) % fs.P
        for c in self.constants:
            acc = (acc + c.eval_all_rows(trace).astype(object)) % fs.P
        return acc.astype(np.uint64)


@dataclass
class Lookup:
    columns: list  # [Column]
    table_column: Column
    frequencies_column: Column
    filter_columns: list  # [Filter]

    def num_helper_columns(self, constraint_degree: int) -> int:
        chunk = max(constraint_degree - 1, 1)
        return -(-len(self.columns) // chunk) + 1


@dataclass(frozen=True)
class GrandProductChallenge:
    beta: int
    gamma: int


@dataclass
class GrandProductChallengeSet:
    challenges: list


def get_grand_product_challenge(challenger) -> GrandProductChallenge:
    return GrandProductChallenge(challenger.get_challenge(), challenger.get_challenge())


def get_grand_product_challenge_set(challenger, num_challenges: int) -> GrandProductChallengeSet:
    return GrandProductChallengeSet(
        [get_grand_product_challenge(challenger) for _ in range(num_challenges)]
    )


def get_helper_cols(trace: np.ndarray, columns_filters: list, challenge,
                    constraint_degree: int) -> list[np.ndarray]:
    """Generic helper columns: chunks of `constraint_degree-1` column-GROUPS;
    each group's value is challenge.combine(cols) = sum beta^i c_i + gamma;
    h = sum over chunk of filter/(combine) (reference lookup.rs get_helper_cols).
    columns_filters: [(list[Column], Filter)]."""
    n = trace.shape[1]
    chunk_size = max(constraint_degree - 1, 1)
    beta, gamma = challenge.beta, challenge.gamma
    helper_columns: list[np.ndarray] = []
    combined = []
    filters = []
    for cols, filt in columns_filters:
        acc = np.zeros(n, dtype=object)
        b_pow = 1
        for col in cols:
            acc = (acc + b_pow * col.eval_all_rows(trace).astype(object)) % fs.P
            b_pow = fs.mul(b_pow, beta)
        combined.append(((acc + gamma) % fs.P).astype(np.uint64))
        filters.append(filt.eval_all_rows(trace))
    for start in range(0, len(combined), chunk_size):
        h_int = [0] * n
        for i in range(start, min(start + chunk_size, len(combined))):
            invs = fs.batch_inverse([int(v) if v else 1 for v in combined[i]])
            for r in range(n):
                assert int(combined[i][r]) != 0, "combine hit zero denominator"
                h_int[r] = fs.add(h_int[r], fs.mul(int(filters[i][r]), invs[r]))
        helper_columns.append(np.asarray(h_int, dtype=np.uint64))
    return helper_columns


def eval_helper_columns(ops, filters, column_groups, local, nxt, helper_columns,
                        constraint_degree: int, challenge, consumer) -> None:
    """ops-generic helper-column checks shared by logUp and CTLs
    (reference lookup.rs eval_helper_columns). column_groups: per group, a
    list of already-ops-evaluated combine TERMS [list of column evals];
    challenge has ops-domain (beta, gamma)."""
    if not helper_columns:
        return
    beta, gamma = challenge
    chunk_size = max(constraint_degree - 1, 1)

    def combine(evals):
        acc = ops.zero()
        for e in reversed(evals):
            acc = ops.add(ops.mul(beta, acc), e)
        return ops.add(acc, gamma)

    for ci, start in enumerate(range(0, len(column_groups), chunk_size)):
        chunk = column_groups[start:start + chunk_size]
        fil = filters[start:start + chunk_size]
        h = helper_columns[ci]
        if len(chunk) == 2:
            combin0 = combine(chunk[0])
            combin1 = combine(chunk[1])
            f0 = fil[0].eval_filter(ops, local, nxt)
            f1 = fil[1].eval_filter(ops, local, nxt)
            consumer.constraint(ops.sub(
                ops.mul(ops.mul(combin1, combin0), h),
                ops.add(ops.mul(f0, combin1), ops.mul(f1, combin0)),
            ))
        elif len(chunk) == 1:
            combin = combine(chunk[0])
            f0 = fil[0].eval_filter(ops, local, nxt)
            consumer.constraint(ops.sub(ops.mul(combin, h), f0))
        else:
            raise NotImplementedError("chunk sizes > 2")


def lookup_helper_columns(lookup: Lookup, trace: np.ndarray, challenge: int,
                          constraint_degree: int) -> list[np.ndarray]:
    """Helper + Z columns for one lookup and one challenge, host numpy
    (reference lookup.rs:579-656). trace: [cols, n] u64."""
    assert len(lookup.columns) == len(lookup.filter_columns)
    n = trace.shape[1]
    chunk_size = max(constraint_degree - 1, 1)
    num_helpers = lookup.num_helper_columns(constraint_degree)

    helper_columns: list[np.ndarray] = []
    cols = [c.eval_all_rows(trace) for c in lookup.columns]
    filters = [f.eval_all_rows(trace) for f in lookup.filter_columns]
    for start in range(0, len(cols), chunk_size):
        h = np.zeros(n, dtype=np.uint64)
        h_int = [0] * n
        for i in range(start, min(start + chunk_size, len(cols))):
            denoms = [(int(cols[i][r]) + challenge) % fs.P for r in range(n)]
            invs = fs.batch_inverse([d if d else 1 for d in denoms])
            for r in range(n):
                if denoms[r] == 0:
                    raise ZeroDivisionError("lookup denominator hit challenge")
                h_int[r] = fs.add(h_int[r], fs.mul(int(filters[i][r]), invs[r]))
        h[:] = h_int
        helper_columns.append(h)

    table = lookup.table_column.eval_all_rows(trace)
    table_inv = fs.batch_inverse([(int(t) + challenge) % fs.P for t in table])
    freq = lookup.frequencies_column.eval_all_rows(trace)

    z = np.zeros(n, dtype=np.uint64)
    acc = 0
    for i in range(n - 1):
        x = 0
        for h in helper_columns:
            x = fs.add(x, int(h[i]))
        x = fs.sub(x, fs.mul(int(freq[i]), table_inv[i]))
        acc = fs.add(acc, x)
        z[i + 1] = acc
    helper_columns.append(z)
    return helper_columns


class LookupCheckVars:
    def __init__(self, local_values, next_values, challenges):
        self.local_values = local_values
        self.next_values = next_values
        self.challenges = challenges


def eval_lookups(ops, stark, frame, lookup_vars: LookupCheckVars, consumer) -> None:
    """ops-generic lookup constraints (reference eval_packed_lookups_generic,
    lookup.rs:804-864) — shared by verifier, device quotient pass and the
    in-circuit dual."""
    local = frame.get_local_values()
    nxt = frame.get_next_values()
    degree = stark.constraint_degree()
    chunk_size = max(degree - 1, 1)
    start = 0
    for lookup in stark.lookups():
        num_helpers = lookup.num_helper_columns(degree)
        for challenge in lookup_vars.challenges:
            ch = challenge  # ops-domain value
            helpers = lookup_vars.local_values[start:start + num_helpers - 1]
            # helper-column checks
            for ci, hstart in enumerate(range(0, len(lookup.columns), chunk_size)):
                chunk = lookup.columns[hstart:hstart + chunk_size]
                fil = lookup.filter_columns[hstart:hstart + chunk_size]
                h = helpers[ci]
                if len(chunk) == 2:
                    combin0 = ops.add(chunk[0].eval(ops, local, nxt), ch)
                    combin1 = ops.add(chunk[1].eval(ops, local, nxt), ch)
                    f0 = fil[0].eval_filter(ops, local, nxt)
                    f1 = fil[1].eval_filter(ops, local, nxt)
                    t = ops.sub(
                        ops.mul(ops.mul(combin1, combin0), h),
                        ops.add(ops.mul(f0, combin1), ops.mul(f1, combin0)),
                    )
                    consumer.constraint(t)
                elif len(chunk) == 1:
                    combin = ops.add(chunk[0].eval(ops, local, nxt), ch)
                    f0 = fil[0].eval_filter(ops, local, nxt)
                    consumer.constraint(ops.sub(ops.mul(combin, h), f0))
                else:
                    raise NotImplementedError("chunk sizes > 2")

            # Z-column check
            z = lookup_vars.local_values[start + num_helpers - 1]
            next_z = lookup_vars.next_values[start + num_helpers - 1]
            table_with_ch = ops.add(lookup.table_column.eval(ops, local, nxt), ch)
            hsum = ops.zero()
            for h in helpers:
                hsum = ops.add(hsum, h)
            y = ops.sub(ops.mul(hsum, table_with_ch),
                        lookup.frequencies_column.eval(ops, local, nxt))
            consumer.constraint_first_row(z)
            consumer.constraint(ops.sub(ops.mul(ops.sub(next_z, z), table_with_ch), y))
            start += num_helpers
