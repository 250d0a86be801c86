"""Host-side utilities: bit math, reductions, timing.

Capability parity with reference util/src/lib.rs + plonky2/src/util/.
"""

from __future__ import annotations

import time
from contextlib import contextmanager

from plonky2_tpu.field import scalar as fs


def log2_strict(n: int) -> int:
    k = n.bit_length() - 1
    assert 1 << k == n, f"{n} is not a power of two"
    return k


def log2_ceil(n: int) -> int:
    return (n - 1).bit_length() if n > 1 else 0


def reverse_bits(x: int, num_bits: int) -> int:
    out = 0
    for _ in range(num_bits):
        out = (out << 1) | (x & 1)
        x >>= 1
    return out


def reverse_index_bits(xs: list) -> list:
    n = len(xs)
    k = log2_strict(n)
    return [xs[reverse_bits(i, k)] for i in range(n)]


class ReducingFactor:
    """Horner-with-shift-count α-reduction (reference util/reducing.rs:25-60).

    Host scalar version over extension elements (tuples of ints).
    """

    def __init__(self, base):
        self.base = base
        self.count = 0

    def reduce(self, values) -> tuple:
        """sum_i base^i * values[i], counting one mul per value."""
        values = list(values)
        d = len(self.base)
        acc = fs.ext_zero(d)
        for v in reversed(values):
            self.count += 1
            acc = fs.ext_add(fs.ext_mul(acc, self.base), self._lift(v, d))
        return acc

    def shift(self, x: tuple) -> tuple:
        out = fs.ext_mul(fs.ext_exp(self.base, self.count), x)
        self.count = 0
        return out

    def _lift(self, v, d):
        if isinstance(v, (tuple, list)):
            return tuple(v)
        return fs.ext_from_base(v, d)


class TimingTree:
    """Hierarchical wall-clock scope profiler (reference util/timing.rs:8-193)."""

    def __init__(self, name: str = "root"):
        self.name = name
        self.duration = 0.0
        self.children: list[TimingTree] = []
        self._stack: list[TimingTree] = [self]
        self._start = time.time()

    @contextmanager
    def scope(self, name: str):
        child = TimingTree(name)
        child._start = time.time()
        self._stack[-1].children.append(child)
        self._stack.append(child)
        try:
            yield
        finally:
            child.duration = time.time() - child._start
            self._stack.pop()

    def print(self, min_seconds: float = 0.0):
        self.duration = time.time() - self._start
        self._print(0, min_seconds)

    def _print(self, depth: int, min_seconds: float):
        if self.duration >= min_seconds:
            print(f"{'  ' * depth}{self.duration:.4f}s {self.name}")
        for c in self.children:
            c._print(depth + 1, min_seconds)


class ContextTree:
    """Named-scope gate-count profiler (reference util/context_tree.rs).

    Use via CircuitBuilder.push_context / pop_context; print_gate_counts
    reports gates added per named scope.
    """

    def __init__(self, name: str = "root", enter_gate_count: int = 0):
        self.name = name
        self.enter_gate_count = enter_gate_count
        self.exit_gate_count = None
        self.children: list[ContextTree] = []

    def push(self, name: str, gate_count: int) -> "ContextTree":
        child = ContextTree(name, gate_count)
        self.children.append(child)
        return child

    def pop(self, gate_count: int) -> None:
        self.exit_gate_count = gate_count

    def gate_count(self, current: int) -> int:
        end = self.exit_gate_count if self.exit_gate_count is not None else current
        return end - self.enter_gate_count

    def print(self, current_gate_count: int, depth: int = 0, min_gates: int = 1) -> None:
        count = self.gate_count(current_gate_count)
        if count >= min_gates:
            print(f"{'  ' * depth}{count} gates to {self.name}")
        for child in self.children:
            child.print(current_gate_count, depth + 1, min_gates)
