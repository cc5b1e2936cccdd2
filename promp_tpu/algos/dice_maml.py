"""DICE-MAML: infinitely-differentiable Monte Carlo estimator objectives.

TPU-native implementation of the reference's DICEMAML / VPG_DICEMAML
(reference: meta_policy_search/meta_algos/dice_maml.py, vpg_dice_maml.py).
Semantics mirrored:

  * magic-box operator ``exp(tau - stop_grad(tau))`` with
    ``tau = cumsum_t(log pi)`` (dice_maml.py:245-259)
  * objective ``-E[magicbox * adjusted_reward * mask]`` on time-major
    (paths, T) buffers for BOTH inner and outer steps (:41-47, :143-154)
  * VPG_DICEMAML: DICE inner step + plain ``-E[log pi * A * mask]`` outer
    step with (paths, T) advantages (vpg_dice_maml.py:93-127)
  * optimizer: Adam full batch (MAMLFirstOrderOptimizer)

The reference flattens (paths, T, d) -> (paths*T, d) for its MLP
(dice_maml.py:236-242); our functional apply broadcasts over leading axes,
so no reshapes are needed.

Practical note (measured, benchmarks/validation/dice_maml_*): the DICE
inner gradient multiplies RAW adjusted discounted rewards (dice_maml.py:36
— per-step discounted reward minus the time baseline, NOT the normalized
GAE advantages the LR/log-lik inner steps use), so its magnitude scales
with the env's reward scale. On envs with |return| ~ 100s the inner_lr
that works for ProMP/VPG-MAML (0.1) overshoots by ~100x; inner_lr ~ 1e-3
restores a sane post-update policy.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.algos.vpg_maml import VPGMAML
from promp_tpu.ops import distributions as dg


def magic_box(logprobs, axis=-1):
    """DICE magic box (dice_maml.py:245-259): value 1 everywhere, gradient
    flows through the cumulative log-probs along the time axis."""
    tau = jnp.cumsum(logprobs, axis=axis)
    return jnp.exp(tau - jax.lax.stop_gradient(tau))


@dataclass(frozen=True)
class DICEMAML(VPGMAML):
    """Defaults mirror dice_maml.py:24-39."""

    def _optimization_view(self, samples_data):
        """DICE optimization keys (dice_maml.py:36)."""
        view = dict(
            observations=samples_data["observations"],
            actions=samples_data["actions"],
            adjusted_rewards=samples_data["adjusted_rewards"],
            mask=samples_data["mask"],
            agent_infos=samples_data["agent_infos"],
        )
        if "advantages" in samples_data:
            view["advantages"] = samples_data["advantages"]
        return view

    def inner_objective(self, params, data, floor_std):
        """-E[magicbox(cumsum log pi) * adj_r * mask] (dice_maml.py:41-47)."""
        dist = self.policy.apply(params, data["observations"],
                                 floor_std=floor_std)
        logli = dg.log_likelihood(data["actions"], dist)  # (P, T)
        return -jnp.mean(magic_box(logli) * data["adjusted_rewards"]
                         * data["mask"])

    def outer_task_objective(self, params_task, data_task):
        return self.inner_objective(params_task, data_task, floor_std=False)

    def meta_objective(self, params, step_sizes, all_data, hparams):
        task_params, inner_kls = self.unrolled_adaptation(
            params, step_sizes, all_data)
        data = self._optimization_view(all_data[-1])

        def task_obj(p, d):
            surr = self.outer_task_objective(p, d)
            dist = self.policy.apply(p, d["observations"], floor_std=False)
            kl = dg.kl(d["agent_infos"], dist)
            outer_kl = jnp.sum(kl * d["mask"]) / jnp.maximum(
                jnp.sum(d["mask"]), 1.0)
            return surr, outer_kl

        surr_objs, outer_kls = jax.vmap(task_obj)(task_params, data)
        loss = jnp.mean(surr_objs)
        aux = dict(inner_kls=jnp.stack(inner_kls) if inner_kls
                   else jnp.zeros((0,)),
                   outer_kl=jnp.mean(outer_kls))
        return loss, aux


@dataclass(frozen=True)
class VPG_DICEMAML(DICEMAML):
    """DICE inner step, plain VPG outer step (vpg_dice_maml.py:93-127)."""

    def outer_task_objective(self, params_task, data_task):
        dist = self.policy.apply(params_task, data_task["observations"],
                                 floor_std=False)
        logli = dg.log_likelihood(data_task["actions"], dist)
        return -jnp.mean(logli * data_task["advantages"] * data_task["mask"])
