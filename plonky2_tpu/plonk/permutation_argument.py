"""Copy-constraint disjoint-set forest and sigma polynomial construction
(reference plonk/permutation_argument.rs)."""

from __future__ import annotations

import numpy as np

from plonky2_tpu.field import scalar as fs
from plonky2_tpu.iop.target import Target, Wire, target_index


class Forest:
    def __init__(self, num_wires: int, num_routed_wires: int, degree: int,
                 num_virtual_targets: int):
        self.num_wires = num_wires
        self.num_routed_wires = num_routed_wires
        self.degree = degree
        self.parents = list(range(num_wires * degree + num_virtual_targets))

    def target_index(self, t: Target) -> int:
        return target_index(t, self.num_wires, self.degree)

    def find(self, x: int) -> int:
        rep = x
        parents = self.parents
        while parents[rep] != rep:
            rep = parents[rep]
        while parents[x] != x:
            parents[x], x = rep, parents[x]
        return rep

    def merge(self, tx: Target, ty: Target) -> None:
        x = self.find(self.target_index(tx))
        y = self.find(self.target_index(ty))
        if x != y:
            self.parents[y] = x

    def compress_paths(self) -> None:
        for i in range(len(self.parents)):
            self.find(i)

    def wire_partition(self) -> "WirePartition":
        """Group routed wires by representative, scan order (row, then column)
        — the scan order fixes the sigma cycles (reference
        permutation_argument.rs:90-104)."""
        partition: dict[int, list[Wire]] = {}
        for row in range(self.degree):
            base = row * self.num_wires
            for column in range(self.num_routed_wires):
                rep = self.parents[base + column]
                partition.setdefault(rep, []).append(Wire(row, column))
        return WirePartition(list(partition.values()))


class WirePartition:
    def __init__(self, partition: list[list[Wire]]):
        self.partition = partition

    def get_sigma_polys(self, degree_log: int, k_is: list[int], subgroup: list[int]) -> np.ndarray:
        """sigma[col][row] = k_{col'} * g^{row'} where (col', row') is the next
        wire in the copy-class cycle. Returns [num_routed, degree] u64."""
        degree = 1 << degree_log
        num_routed = len(k_is)
        sigma = self.get_sigma_map(degree, num_routed)
        out = np.empty((num_routed, degree), dtype=np.uint64)
        for col in range(num_routed):
            for row in range(degree):
                x = sigma[col * degree + row]
                out[col, row] = fs.mul(k_is[x // degree], subgroup[x % degree])
        return out

    def get_sigma_map(self, degree: int, num_routed_wires: int) -> list[int]:
        neighbors: dict[Wire, Wire] = {}
        for subset in self.partition:
            for n in range(len(subset)):
                neighbors[subset[n]] = subset[(n + 1) % len(subset)]
        sigma = []
        for column in range(num_routed_wires):
            for row in range(degree):
                nb = neighbors[Wire(row, column)]
                sigma.append(nb.column * degree + nb.row)
        return sigma
