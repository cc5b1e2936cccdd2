"""Conjugate-gradient trust-region optimizer, fully on device.

TPU-native replacement for the reference's TRPO machinery (reference:
meta_policy_search/optimizers/conjugate_gradient_optimizer.py). Two major
upgrades over the reference while preserving its decision logic:

  * Exact Hessian-vector products via ``jax.jvp(jax.grad(kl))`` instead of
    finite differences of the constraint gradient
    (conjugate_gradient_optimizer.py:59-89) — no epsilon tuning, no 2
    extra full passes + 4 host param-set round-trips per CG iteration
    (SURVEY.md §2.9 P8).
  * CG loop (Demmel p312, :325-354) and the backtracking line search
    (:277-303) run as ``lax.while_loop``s inside jit — the reference does
    ~15 host-driven set_params/loss/constraint round-trips per outer step.

Decision logic mirrored exactly: initial step ``sqrt(2 delta / d^T H d)``
(:264-265), backtrack ratios ``0.8^k`` (k < 15), acceptance when
``loss < loss_before and kl <= delta``, and rejection of the step when the
final candidate is NaN / non-improving / constraint-violating unless
``accept_violation`` (:287-303).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.policies.gaussian_mlp import flatten_params, unflatten_params


def conjugate_gradients(f_Ax, b, cg_iters=10, residual_tol=1e-10):
    """Solve A x = b with CG (conjugate_gradient_optimizer.py:325-354)."""
    def cond(state):
        i, _, _, _, rdotr = state
        return jnp.logical_and(i < cg_iters, rdotr >= residual_tol)

    def body(state):
        i, x, r, p, rdotr = state
        z = f_Ax(p)
        v = rdotr / jnp.dot(p, z)
        x = x + v * p
        r = r - v * z
        newrdotr = jnp.dot(r, r)
        mu = newrdotr / rdotr
        p = r + mu * p
        return i + 1, x, r, p, newrdotr

    x0 = jnp.zeros_like(b)
    state = (jnp.zeros((), jnp.int32), x0, b, b, jnp.dot(b, b))
    _, x, _, _, _ = jax.lax.while_loop(cond, body, state)
    return x


@dataclass(frozen=True)
class FiniteDifferenceHvp:
    """Finite-difference Hessian-vector products.

    Provided for parity with the reference's default HVP approach
    (conjugate_gradient_optimizer.py:8-104): perturb the parameters
    +-eps*x, re-evaluate the constraint gradient, central difference.
    The exact jvp-of-grad HVP (the optimizer default here) is both cheaper
    and epsilon-free; this exists for apples-to-apples comparisons.
    """

    base_eps: float = 1e-5
    symmetric: bool = True

    def build_eval(self, constraint_fn, params, spec, reg_coeff):
        flat0, _ = flatten_params(params)
        grad_fn = jax.grad(constraint_fn)

        def flat_grad(flat):
            g = grad_fn(unflatten_params(flat, spec))
            fg, _ = flatten_params(g)
            return fg

        def hvp(x):
            eps = self.base_eps
            plus = flat_grad(flat0 + eps * x)
            if self.symmetric:
                minus = flat_grad(flat0 - eps * x)
                return (plus - minus) / (2 * eps) + reg_coeff * x
            base = flat_grad(flat0)
            return (plus - base) / eps + reg_coeff * x

        return hvp


@dataclass(frozen=True)
class ConjugateGradientOptimizer:
    """Config mirrors conjugate_gradient_optimizer.py:124-147 defaults."""

    cg_iters: int = 10
    reg_coeff: float = 0.0
    backtrack_ratio: float = 0.8
    max_backtracks: int = 15
    accept_violation: bool = False
    hvp_reg: float = 1e-5  # small damping added to H for CG stability
    hvp_approach: str = "exact"  # | "finite_difference"
    fd_base_eps: float = 1e-5

    def optimize(self, loss_fn, constraint_fn, params, max_constraint_val):
        """One TRPO step.

        Args:
            loss_fn, constraint_fn: pure ``params -> scalar`` closures over
                the (fixed) sample data.
            params: policy parameter pytree.
            max_constraint_val: trust-region size delta.

        Returns:
            (new_params, info dict with backtrack_iters/violated/loss/kl).
        """
        loss_before = loss_fn(params)
        grads = jax.grad(loss_fn)(params)
        g, spec = flatten_params(grads)

        if self.hvp_approach == "finite_difference":
            hvp = FiniteDifferenceHvp(base_eps=self.fd_base_eps).build_eval(
                constraint_fn, params, spec,
                self.reg_coeff + self.hvp_reg)
        else:
            def hvp(x):
                vec = unflatten_params(x, spec)
                _, hv = jax.jvp(jax.grad(constraint_fn), (params,), (vec,))
                flat_hv, _ = flatten_params(hv)
                return flat_hv + (self.reg_coeff + self.hvp_reg) * x

        descent = conjugate_gradients(hvp, g, self.cg_iters)
        dHd = jnp.dot(descent, hvp(descent))
        initial_step_size = jnp.sqrt(
            2.0 * max_constraint_val / (dHd + 1e-8))
        initial_step = initial_step_size * descent

        prev_flat, _ = flatten_params(params)

        def eval_candidate(n):
            ratio = self.backtrack_ratio ** n
            cand_flat = prev_flat - ratio * initial_step
            cand = unflatten_params(cand_flat, spec)
            return cand_flat, loss_fn(cand), constraint_fn(cand)

        def cond(state):
            n, _, loss, kl = state
            accepted = jnp.logical_and(loss < loss_before,
                                       kl <= max_constraint_val)
            return jnp.logical_and(n < self.max_backtracks,
                                   jnp.logical_not(accepted))

        def body(state):
            n, _, _, _ = state
            cand_flat, loss, kl = eval_candidate(n.astype(jnp.float32))
            return n + 1, cand_flat, loss, kl

        # evaluate candidate 0 first (the reference's loop body runs at
        # least once), then continue while not accepted
        first_flat, first_loss, first_kl = eval_candidate(0.0)
        n, cand_flat, loss, kl = jax.lax.while_loop(
            cond, body, (jnp.ones((), jnp.int32), first_flat, first_loss,
                         first_kl))

        violated = (jnp.isnan(loss) | jnp.isnan(kl)
                    | (loss >= loss_before) | (kl >= max_constraint_val))
        nan_init = jnp.isnan(initial_step_size)
        take_step = jnp.logical_and(
            jnp.logical_not(nan_init),
            jnp.logical_or(jnp.logical_not(violated),
                           jnp.array(self.accept_violation)))
        new_flat = jnp.where(take_step, cand_flat, prev_flat)
        new_params = unflatten_params(new_flat, spec)
        info = dict(backtrack_iters=n - 1, violated=violated,
                    loss_before=loss_before, loss=loss, kl=kl,
                    step_taken=take_step)
        return new_params, info
