"""TRPO-MAML (and E-MAML): trust-region outer step on the meta-objective.

TPU-native implementation of the reference's TRPOMAML
(reference: meta_policy_search/meta_algos/trpo_maml.py). Semantics mirrored:

  * inner objective: likelihood-ratio or log-likelihood surrogate (:49-67)
  * outer objective: plain surrogate ``-E[LR * A]`` on post-update dists,
    task-averaged (:125-152), with optional E-MAML exploration term
    (:137-144, ``exploration=True``)
  * constraint: mean outer KL <= step_size, solved by conjugate gradients +
    backtracking line search (:154-159)

The CG machinery uses EXACT Hessian-vector products (jvp-of-grad) instead
of the reference's finite differences, and runs entirely on device — see
promp_tpu/optimizers/trpo.py.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.algos.vpg_maml import VPGMAML
from promp_tpu.ops import distributions as dg
from promp_tpu.optimizers.trpo import ConjugateGradientOptimizer


@dataclass(frozen=True)
class TRPOMAML(VPGMAML):
    """Defaults mirror trpo_maml.py:23-45."""

    step_size: float = 0.01
    cg_iters: int = 10
    reg_coeff: float = 0.0
    backtrack_ratio: float = 0.8
    max_backtracks: int = 15

    def make_optimizer(self):
        return ConjugateGradientOptimizer(
            cg_iters=self.cg_iters, reg_coeff=self.reg_coeff,
            backtrack_ratio=self.backtrack_ratio,
            max_backtracks=self.max_backtracks)

    def init_opt_state(self, train_state):
        return ()

    def surrogate_and_kl(self, params, step_sizes, all_data):
        """(meta surrogate loss, mean outer KL) — trpo_maml.py:125-152."""
        task_params, inner_kls = self.unrolled_adaptation(
            params, step_sizes, all_data)
        data = self._optimization_view(all_data[-1])

        def task_objective(p, d):
            dist = self.policy.apply(p, d["observations"], floor_std=False)
            lr = dg.likelihood_ratio(d["actions"], d["agent_infos"], dist)
            outer_kl = jnp.mean(dg.kl(d["agent_infos"], dist))
            return -jnp.mean(lr * d["advantages"]), outer_kl

        surr_objs, outer_kls = jax.vmap(task_objective)(task_params, data)
        if self.exploration:
            surr_objs = surr_objs + self._exploration_term(params, all_data)
        inner = (jnp.stack(inner_kls) if inner_kls else jnp.zeros((0,)))
        return jnp.mean(surr_objs), jnp.mean(outer_kls), inner

    def optimize_policy(self, train_state, opt_state, all_data, hparams):
        """TRPO outer step (trpo_maml.py:161-192). Only the policy params
        move; step sizes stay fixed (they are non-trainable by default and
        the reference's CG target is the policy, :154-159)."""
        step_sizes = train_state["step_sizes"]

        def loss_fn(params):
            loss, _, _ = self.surrogate_and_kl(params, step_sizes, all_data)
            return loss

        def kl_fn(params):
            _, kl, _ = self.surrogate_and_kl(params, step_sizes, all_data)
            return kl

        params = train_state["params"]
        kl_before = kl_fn(params)
        optimizer = self.make_optimizer()
        new_params, info = optimizer.optimize(loss_fn, kl_fn, params,
                                              self.step_size)
        train_state = dict(train_state, params=new_params)
        _, _, inner_kls = self.surrogate_and_kl(new_params, step_sizes,
                                                all_data)
        metrics = dict(
            LossBefore=info["loss_before"], LossAfter=info["loss"],
            MeanKLBefore=kl_before, MeanKL=info["kl"],
            dLoss=info["loss_before"] - info["loss"],
            KLInner=jnp.mean(inner_kls), inner_kls=inner_kls,
            BacktrackIters=info["backtrack_iters"],
            StepRejected=jnp.logical_not(info["step_taken"]),
        )
        return train_state, opt_state, metrics
