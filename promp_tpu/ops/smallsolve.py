"""Unrolled SPD solves for tiny systems (the engine's (M + hC + h²K) qdd).

``jnp.linalg.cholesky`` / ``cho_solve`` lower to XLA's generic blocked
LAPACK-style loops, which on TPU cost ~800 us per call even for a batched
9x9 system — measured at 78% of the whole cheetah substep (round 4,
benchmarks/RESULTS.md §2). For the engine's nv <= 25 systems the right
TPU shape is a STATICALLY UNROLLED Cholesky-Crout + substitution: every
entry is a short fused multiply-add chain over the batch dimension, so the
whole solve compiles to a handful of elementwise kernels with no loops, no
dynamic slicing, and no wasted lane padding.

Per-instance formulation (operates on one (n, n) system; `jax.vmap` lifts
it over env batches — reference analog: mujoco's mj_solveM dense path).
"""
from __future__ import annotations

import jax.numpy as jnp


def chol_solve_unrolled(A, b, *, pivot_floor=1e-12):
    """Solve A x = b for SPD A via fully unrolled Cholesky.

    A: (n, n) symmetric positive definite (n static, intended n <= ~25)
    b: (n,)
    Returns x: (n,).

    The unroll is O(n^2) scalar ops; under vmap each is an elementwise op
    over the batch, which XLA fuses. ``pivot_floor`` clamps the squared
    pivots so a numerically semidefinite A (the engine's gimbal-lock
    corner before regularization) yields finite output instead of NaN
    poisoning the whole rollout batch.
    """
    n = A.shape[-1]
    x = solve_from_entries(lambda i, j: A[i, j], lambda i: b[i], n,
                           pivot_floor=pivot_floor)
    return jnp.stack(x)


def solve_from_entries(a_entry, b_entry, n, *, pivot_floor=1e-12):
    """The unrolled solve on scalar ACCESSORS — for callers that hold the
    system as individual scalars and never materialize the matrix (the
    planar fast path, envs/mujoco/planar.py). ``a_entry(i, j)`` /
    ``b_entry(i)`` return system entries; result is a LIST of n scalars.
    """
    # L entries as scalars: L[i][j] for j <= i
    L = [[None] * (i + 1) for i in range(n)]
    for j in range(n):
        s = a_entry(j, j)
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, pivot_floor))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = a_entry(i, j)
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d

    # forward substitution: L y = b
    y = [None] * n
    for i in range(n):
        s = b_entry(i)
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]

    # back substitution: L^T x = y
    x = [None] * n
    for i in range(n - 1, -1, -1):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return x
