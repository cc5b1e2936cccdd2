"""VPG-MAML: first-order outer step (REINFORCE meta-objective).

TPU-native implementation of the reference's VPGMAML
(reference: meta_policy_search/meta_algos/vpg_maml.py). Semantics mirrored:

  * inner objective: likelihood-ratio or log-likelihood surrogate (:47-64)
  * outer objective: ``-E[log pi(a) * A]`` on post-update distributions,
    averaged over tasks (:119-139)
  * optional E-MAML exploration term
    ``- mean(adj_avg_rewards_laststep) * mean(log pi_0(a_0))`` using
    PRE-update actions/distributions (:127-134) — gradients flow to the
    pre-update policy, crediting exploratory behavior
  * optimizer: Adam, single full-batch epoch per call
    (MAMLFirstOrderOptimizer, maml_first_order_optimizer.py:82-115)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.algos.base import MAMLAlgo
from promp_tpu.ops import distributions as dg
from promp_tpu.optimizers.adam import Adam


@dataclass(frozen=True)
class VPGMAML(MAMLAlgo):
    """Defaults mirror vpg_maml.py:24-32."""

    learning_rate: float = 1e-3
    inner_type: str = "likelihood_ratio"  # | "log_likelihood"
    exploration: bool = False
    max_epochs: int = 1

    def __post_init__(self):
        assert self.inner_type in ("likelihood_ratio", "log_likelihood")

    def inner_objective(self, params, data, floor_std):
        if self.inner_type == "log_likelihood":
            return self.log_likelihood_objective(params, data, floor_std)
        return super().inner_objective(params, data, floor_std)

    def init_opt_state(self, train_state):
        return Adam(learning_rate=self.learning_rate).init(train_state)

    def meta_objective(self, params, step_sizes, all_data, hparams):
        task_params, inner_kls = self.unrolled_adaptation(
            params, step_sizes, all_data)
        data = self._optimization_view(all_data[-1])

        def task_objective(p, d):
            dist = self.policy.apply(p, d["observations"], floor_std=False)
            logli = dg.log_likelihood(d["actions"], dist)
            outer_kl = jnp.mean(dg.kl(d["agent_infos"], dist))
            return -jnp.mean(logli * d["advantages"]), outer_kl

        surr_objs, outer_kls = jax.vmap(task_objective)(task_params, data)

        if self.exploration:
            surr_objs = surr_objs + self._exploration_term(params, all_data)

        loss = jnp.mean(surr_objs)
        aux = dict(inner_kls=jnp.stack(inner_kls) if inner_kls
                   else jnp.zeros((0,)),
                   outer_kl=jnp.mean(outer_kls))
        return loss, aux

    def _exploration_term(self, params, all_data):
        """E-MAML credit assignment to pre-update sampling
        (vpg_maml.py:127-134 / trpo_maml.py:137-144): per task,
        ``- mean(adj_avg_rewards[last round]) * mean(log pi_theta(a_0))``
        with step-0 dists from the current pre-update params."""
        data0 = all_data[0]
        adj = all_data[-1]["adj_avg_rewards"]  # (tasks, P, T)

        def per_task(obs0, act0, adj_n):
            dist0 = self.policy.apply(params, obs0, floor_std=True)
            logli0 = dg.log_likelihood(act0, dist0)
            return -jnp.mean(adj_n) * jnp.mean(logli0)

        return jax.vmap(per_task)(data0["observations"], data0["actions"],
                                  adj)

    def optimize_policy(self, train_state, opt_state, all_data, hparams):
        optimizer = Adam(learning_rate=self.learning_rate)

        def loss_fn(ts):
            return self.meta_objective(ts["params"], ts["step_sizes"],
                                       all_data, hparams)

        def epoch(carry, _):
            ts, os_ = carry
            (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(ts)
            grads = self.mask_grads(grads)
            ts, os_ = optimizer.update(grads, os_, ts)
            return (ts, os_), loss

        (train_state, opt_state), losses = jax.lax.scan(
            epoch, (train_state, opt_state), None, length=self.max_epochs)
        loss_after, aux = loss_fn(train_state)
        metrics = dict(LossBefore=losses[0], LossAfter=loss_after,
                       KLInner=jnp.mean(aux["inner_kls"]),
                       KLOuter=aux["outer_kl"],
                       inner_kls=aux["inner_kls"],
                       SkippedUpdates=opt_state.skipped)
        return train_state, opt_state, metrics
