"""Witness containers (reference iop/witness.rs).

`PartialWitness`: user-provided input map. `PartitionWitness`: one value slot
per copy-constraint equivalence class (disjoint-set representative), sized by
the built circuit. `full_witness` materializes the [num_wires, degree] matrix
consumed by the device prover.
"""

from __future__ import annotations

import numpy as np

from plonky2_tpu.iop.target import Target, Wire, VirtualTarget, target_index


class PartialWitness:
    def __init__(self):
        self.target_values: dict[Target, int] = {}

    def set_target(self, target: Target, value: int) -> None:
        old = self.target_values.get(target)
        if old is not None and old != value:
            raise ValueError(f"Target {target} set twice with different values: {old} != {value}")
        self.target_values[target] = value

    def set_targets(self, targets, values) -> None:
        for t, v in zip(targets, values):
            self.set_target(t, v)

    def set_extension_target(self, ext_target, value: tuple) -> None:
        for t, v in zip(ext_target.parts, value):
            self.set_target(t, v)

    def set_hash_target(self, hash_target, value4) -> None:
        for t, v in zip(hash_target, value4):
            self.set_target(t, v)

    def set_bool_target(self, bool_target, value: bool) -> None:
        self.set_target(bool_target.target, 1 if value else 0)


class PartitionWitness:
    """One Option<F> slot per representative (reference iop/witness.rs:333).

    Storage is a pair of numpy arrays (values u64 + known mask) so the
    levelized batch generator engine (iop/generator.py) can gather/scatter
    whole generator batches without per-target Python overhead."""

    def __init__(self, representative_map, num_wires: int, degree: int):
        self.representative_map = representative_map
        self.num_wires = num_wires
        self.degree = degree
        if isinstance(representative_map, np.ndarray):
            self._rep_np: np.ndarray | None = representative_map
            n = int(representative_map.max()) + 1 if representative_map.size else 0
        else:
            self._rep_np = None
            n = max(representative_map) + 1 if len(representative_map) else 0
        self.values = np.zeros(n, dtype=np.uint64)
        self.known = np.zeros(n, dtype=bool)

    def rep_index(self, target: Target) -> int:
        return self.representative_map[target_index(target, self.num_wires, self.degree)]

    def rep_map_np(self) -> np.ndarray:
        """representative_map as a numpy array (cached; the map is immutable
        once the circuit is built)."""
        if self._rep_np is None:
            self._rep_np = np.asarray(self.representative_map, dtype=np.int64)
        return self._rep_np

    def wire_reps(self, rows, column) -> np.ndarray:
        """Vectorized rep_index for Wire(row, column); rows and column may be
        arrays (broadcast) or scalars."""
        rows = np.asarray(rows, dtype=np.int64)
        cols = np.asarray(column, dtype=np.int64)
        return self.rep_map_np()[rows * self.num_wires + cols]

    def try_get_target(self, target: Target):
        rep = self.rep_index(target)
        return int(self.values[rep]) if self.known[rep] else None

    def get_target(self, target: Target) -> int:
        rep = self.rep_index(target)
        assert self.known[rep], f"Target {target} not set"
        return int(self.values[rep])

    def get_targets(self, targets) -> list[int]:
        return [self.get_target(t) for t in targets]

    def get_extension_target(self, ext_target) -> tuple:
        return tuple(self.get_target(t) for t in ext_target.parts)

    def contains(self, target: Target) -> bool:
        return bool(self.known[self.rep_index(target)])

    def contains_all(self, targets) -> bool:
        return all(self.contains(t) for t in targets)

    def set_target(self, target: Target, value: int):
        """Returns the representative index if newly set, else None.
        Raises on conflicting double-set."""
        rep = self.rep_index(target)
        if self.known[rep]:
            if int(self.values[rep]) != value:
                raise ValueError(
                    f"Partition containing {target} was set twice with different values: "
                    f"{int(self.values[rep])} != {value}"
                )
            return None
        self.values[rep] = value
        self.known[rep] = True
        return rep

    # -- vector interface for the batch generator engine --------------------

    def get_reps(self, reps: np.ndarray) -> np.ndarray:
        """Values at representative indices [k] (all must be known)."""
        assert self.known[reps].all(), "batch read of unset representative"
        return self.values[reps]

    def set_reps(self, reps: np.ndarray, vals: np.ndarray) -> None:
        """Vector double-set-consistency write (duplicate reps within one
        batch and already-known reps must agree with the new values)."""
        prev_known = self.known[reps]
        if prev_known.any():
            bad = prev_known & (self.values[reps] != vals)
            if bad.any():
                raise ValueError(
                    "Partition was batch-set twice with different values "
                    f"(first rep {int(reps[bad][0])})"
                )
        order = np.argsort(reps, kind="stable")
        rs, vs = reps[order], vals[order]
        dup = rs[1:] == rs[:-1]
        if dup.any() and (vs[1:][dup] != vs[:-1][dup]).any():
            raise ValueError("conflicting duplicate writes within one batch")
        self.values[reps] = vals
        self.known[reps] = True

    def full_witness(self) -> np.ndarray:
        """[num_wires, degree] matrix; unset wires default to 0
        (reference iop/witness.rs:376 `MatrixWitness`)."""
        vals = np.where(self.known, self.values, np.uint64(0))
        rep = np.asarray(
            self.representative_map[: self.degree * self.num_wires], dtype=np.int64
        )
        return vals[rep].reshape(self.degree, self.num_wires).T.copy()
