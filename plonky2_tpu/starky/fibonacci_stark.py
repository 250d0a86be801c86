"""Toy Fibonacci STARK (reference starky/src/fibonacci_stark.rs) — driver
config 3."""

from __future__ import annotations

import numpy as np

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.starky.stark import Stark


class FibonacciStark(Stark):
    """State [x0, x1]; transition x0' <- x1, x1' <- x0 + x1."""

    COLUMNS = 2
    PUBLIC_INPUTS = 3
    PI_INDEX_X0 = 0
    PI_INDEX_X1 = 1
    PI_INDEX_RES = 2

    def __init__(self, num_rows: int):
        self.num_rows = num_rows

    def generate_trace(self, x0: int, x1: int) -> np.ndarray:
        """[COLUMNS, num_rows] u64 trace."""
        rows = np.empty((self.num_rows, 2), dtype=np.uint64)
        a, b = x0, x1
        for i in range(self.num_rows):
            rows[i] = (a, b)
            a, b = b, fs.add(a, b)
        return rows.T.copy()

    def eval(self, ops, frame, consumer) -> None:
        local = frame.get_local_values()
        nxt = frame.get_next_values()
        pis = frame.get_public_inputs()

        consumer.constraint_first_row(ops.sub(local[0], pis[self.PI_INDEX_X0]))
        consumer.constraint_first_row(ops.sub(local[1], pis[self.PI_INDEX_X1]))
        consumer.constraint_last_row(ops.sub(local[1], pis[self.PI_INDEX_RES]))
        # x0' <- x1
        consumer.constraint_transition(ops.sub(nxt[0], local[1]))
        # x1' <- x0 + x1
        consumer.constraint_transition(ops.sub(nxt[1], ops.add(local[0], local[1])))

    def constraint_degree(self) -> int:
        return 2


def fibonacci(n: int, x0: int, x1: int) -> int:
    a, b = x0, x1
    for _ in range(n):
        a, b = b, fs.add(a, b)
    return b
