"""Host-side Lagrange/barycentric interpolation over extension elements.

Reference: field/src/interpolation.rs:13-86. Used by the FRI verifier's
per-fold-step coset interpolation (small sizes: arity <= 16), so scalar host
math is appropriate.
"""

from __future__ import annotations

from plonky2_tpu.field import scalar as fs


def barycentric_weights(points: list[tuple]) -> list[tuple]:
    """points: [(x_i, y_i)] with x_i, y_i extension tuples."""
    n = len(points)
    weights = []
    for i in range(n):
        prod = fs.ext_one(len(points[i][0]))
        for j in range(n):
            if j != i:
                prod = fs.ext_mul(prod, fs.ext_sub(points[i][0], points[j][0]))
        weights.append(prod)
    return [fs.ext_inverse(w) for w in weights]


def interpolate(points: list[tuple], x: tuple, weights: list[tuple]) -> tuple:
    """Barycentric evaluation of the interpolant at x."""
    for x_i, y_i in points:
        if x_i == x:
            return y_i
    d = len(x)
    l_x = fs.ext_one(d)
    for x_i, _ in points:
        l_x = fs.ext_mul(l_x, fs.ext_sub(x, x_i))
    total = fs.ext_zero(d)
    for (x_i, y_i), w_i in zip(points, weights):
        term = fs.ext_mul(fs.ext_div(w_i, fs.ext_sub(x, x_i)), y_i)
        total = fs.ext_add(total, term)
    return fs.ext_mul(l_x, total)
