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


def clamped_pivot_count(A, *, pivot_floor=1e-12):
    """Diagnostic mate of the clamped-pivot solvers (r5 ADVICE item): the
    number of Cholesky pivots of ``A`` that hit ``pivot_floor`` — i.e.
    how many directions of the system were numerically semidefinite and
    silently regularized into finite-but-inaccurate output. Zero for a
    healthy engine step; probe under vmap over a rollout batch to detect
    masked physics instability."""
    n = A.shape[-1]
    idx = jnp.arange(n)
    clamped = jnp.zeros((), jnp.int32)
    for j in range(n):
        cj = A[:, j]
        clamped = clamped + (cj[j] <= pivot_floor).astype(jnp.int32)
        d = jnp.sqrt(jnp.maximum(cj[j], pivot_floor))
        lj = jnp.where(idx > j, cj / d, jnp.zeros_like(cj)).at[j].set(d)
        A = A - lj[:, None] * lj[None, :]
    return clamped


def chol_solve_cols(A, b, *, pivot_floor=1e-12):
    """Solve A x = b for SPD A via a COLUMN-vectorized unrolled Cholesky.

    A: (n, n) SPD (n static); b: (n,). Returns x: (n,).

    The scalar unroll in :func:`chol_solve_unrolled` emits O(n^2) entry
    ops (plus O(n^2) slices when the caller holds a materialized matrix);
    at humanoid size (nv = 23) that program wedged the remote XLA compile
    (engine.py round-4 note). This variant keeps the matrix WHOLE and
    unrolls only the n pivot steps, each a handful of vector ops (static
    column slice, rsqrt, masked rank-1 update), so program size is O(n)
    ops of (n, n)/(n,) shapes: compile-bounded at any engine nv, and still
    free of XLA's generic blocked-Cholesky overhead (measured 1.9 ms of
    the 2.7 ms humanoid substep at batch 800 — benchmarks/RESULTS.md r5).
    Under vmap every step is one elementwise kernel over the batch.
    """
    n = A.shape[-1]
    idx = jnp.arange(n)
    cols = []
    for j in range(n):
        cj = A[:, j]
        d = jnp.sqrt(jnp.maximum(cj[j], pivot_floor))
        # diagonal = the CLAMPED pivot d itself (not cj[j]/d, which is 0
        # for a semidefinite pivot and would NaN the substitutions)
        lj = jnp.where(idx > j, cj / d, jnp.zeros_like(cj)).at[j].set(d)
        cols.append(lj)
        # rank-1 update of the trailing submatrix; rows/cols < j of lj are
        # zero so already-finished entries are untouched
        A = A - lj[:, None] * lj[None, :]
    L = jnp.stack(cols, axis=1)                                # (n, n) lower

    # forward substitution L y = b, one unrolled elimination per column
    y = b
    ys = []
    for j in range(n):
        yj = y[j] / L[j, j]
        ys.append(yj)
        y = y - L[:, j] * yj
    # back substitution L^T x = y: x[j] = (y[j] - sum_{k>j} L[k,j] x[k]) / L[j,j];
    # x[k]'s contribution to every j < k is row k of L scaled by x[k]
    xs = [None] * n
    acc = jnp.zeros_like(b)
    for j in range(n - 1, -1, -1):
        xj = (ys[j] - acc[j]) / L[j, j]
        xs[j] = xj
        acc = acc + L[j] * xj
    return jnp.stack(xs)


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
