"""ProMP: Proximal Meta-Policy Search (the headline algorithm).

TPU-native implementation of the reference's ProMP
(reference: meta_policy_search/meta_algos/pro_mp.py). Semantics mirrored:

  * inner objective: likelihood-ratio surrogate ``-E[LR * A]`` (:59-65)
  * outer objective: PPO-clipped surrogate on post-update distributions,
    averaged over tasks, PLUS the inner-KL penalty
    ``mean(eta_s * mean_inner_kl_step_s)`` (:134-155)
  * optimizer: Adam for ``num_ppo_steps`` epochs on the full meta-batch
    without re-sampling (:46, maml_first_order_optimizer.py:82-115)
  * adaptive KL-coefficient x2 / /2 rule vs ``target_inner_step``
    (:190-214), applied on the host between iterations
  * clip-eps annealing via ``anneal_factor`` (:51-52)

The whole outer step — unrolled inner adaptation, clipped objective,
second-order gradients, 5 Adam epochs — runs as ONE jitted computation
(a ``lax.scan`` over epochs) instead of 5 full-graph sess.runs.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from promp_tpu.algos.base import MAMLAlgo
from promp_tpu.ops import distributions as dg
from promp_tpu.optimizers.adam import Adam


@dataclass(frozen=True)
class ProMP(MAMLAlgo):
    """Defaults mirror pro_mp.py:30-43."""

    learning_rate: float = 1e-3
    num_ppo_steps: int = 5
    clip_eps: float = 0.2
    target_inner_step: float = 0.01
    init_inner_kl_penalty: float = 1e-2
    adaptive_inner_kl_penalty: bool = True
    anneal_factor: float = 1.0
    # outer-KL early stop (round-5 deep-horizon safeguard, off by
    # default for reference parity): when > 0, PPO epochs halt once the
    # mean KL(sampling policy || current policy) exceeds the limit.
    # Diagnosis behind it: the 5000-iteration Hopper rand-params run
    # collapsed non-NaN at itr ~3900 with KLOuter spiking 600-2000 while
    # the clipped objective kept pushing (policy std ~0.14 makes tiny
    # mean shifts enormous in KL); the clip bounds the per-sample ratio,
    # not the aggregate step (benchmarks/validation/HopperRandParams
    # Env_5k). Standard PPO practice (target-KL early stopping).
    outer_kl_limit: float = 0.0

    def make_optimizer(self):
        return Adam(learning_rate=self.learning_rate)

    def init_opt_state(self, train_state):
        return self.make_optimizer().init(train_state)

    def init_hparams(self):
        """Host-side hyperparameters fed into the jitted outer step as
        traced values (the reference feeds them as placeholders,
        pro_mp.py:128-132), so annealing/adaptation never recompiles."""
        return dict(
            inner_kl_coeff=np.full((self.num_inner_grad_steps,),
                                   self.init_inner_kl_penalty, np.float32),
            clip_eps=np.float32(self.clip_eps),
        )

    def update_hparams(self, hparams, metrics):
        """Adaptive KL coeff (pro_mp.py:190-192) + clip-eps annealing (:51)."""
        hparams = dict(hparams)
        if self.adaptive_inner_kl_penalty:
            hparams["inner_kl_coeff"] = self.adapt_kl_coeff(
                hparams["inner_kl_coeff"], np.asarray(metrics["inner_kls"]),
                self.target_inner_step)
        if self.anneal_factor != 1.0:
            hparams["clip_eps"] = np.float32(
                hparams["clip_eps"] * self.anneal_factor)
        return hparams

    # -------------------------------------------------------- meta objective
    def meta_objective(self, params, step_sizes, all_data, inner_kl_coeff,
                       clip_eps):
        """Clipped surrogate + inner-KL penalty (pro_mp.py:124-155).

        Returns (loss, aux) with aux = {inner_kls (steps,), outer_kl}.
        """
        task_params, inner_kls = self.unrolled_adaptation(
            params, step_sizes, all_data)
        data = self._optimization_view(all_data[-1])

        def task_objective(p, d):
            dist = self.policy.apply(p, d["observations"], floor_std=False)
            lr = dg.likelihood_ratio(d["actions"], d["agent_infos"], dist)
            outer_kl = jnp.mean(dg.kl(d["agent_infos"], dist))
            adv = d["advantages"]
            clipped = jnp.minimum(
                lr * adv,
                jnp.clip(lr, 1.0 - clip_eps, 1.0 + clip_eps) * adv)
            return -jnp.mean(clipped), outer_kl

        surr_objs, outer_kls = jax.vmap(task_objective)(task_params, data)
        inner_kls = jnp.stack(inner_kls)
        inner_kl_penalty = jnp.mean(inner_kl_coeff * inner_kls)
        loss = jnp.mean(surr_objs) + inner_kl_penalty
        return loss, dict(inner_kls=inner_kls, outer_kl=jnp.mean(outer_kls))

    # ------------------------------------------------------------ outer step
    def optimize_policy(self, train_state, opt_state, all_data, hparams):
        """num_ppo_steps Adam epochs on the meta-objective, inside jit.

        ``train_state`` is {"params": ..., "step_sizes": ...}; step-size
        gradients are masked out unless ``trainable_inner_step_size``
        (mirroring which tf.Variables are trainable, base.py:303-313).

        Returns (train_state, opt_state, metrics).
        """
        inner_kl_coeff = hparams["inner_kl_coeff"]
        clip_eps = hparams["clip_eps"]
        optimizer = self.make_optimizer()

        def loss_fn(ts):
            return self.meta_objective(ts["params"], ts["step_sizes"],
                                       all_data, inner_kl_coeff, clip_eps)

        if self.outer_kl_limit > 0.0:
            # KL-gated epochs: once the outer KL (vs the sampling policy)
            # exceeds the limit, remaining epochs become no-ops — the
            # lax.scan shape stays static, the update is masked out
            def epoch(carry, _):
                ts, os, halted = carry
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(ts)
                grads = self.mask_grads(grads)
                halted = jnp.logical_or(
                    halted, aux["outer_kl"] > self.outer_kl_limit)
                ts_new, os_new = optimizer.update(grads, os, ts)
                keep = lambda new, old: jax.tree.map(
                    lambda n, o: jnp.where(halted, o, n), new, old)
                return (keep(ts_new, ts), keep(os_new, os), halted), loss

            (train_state, opt_state, _h), losses = jax.lax.scan(
                epoch, (train_state, opt_state, jnp.array(False)), None,
                length=self.num_ppo_steps)
        else:
            def epoch(carry, _):
                ts, os = carry
                (loss, aux), grads = jax.value_and_grad(
                    loss_fn, has_aux=True)(ts)
                grads = self.mask_grads(grads)
                ts, os = optimizer.update(grads, os, ts)
                return (ts, os), loss

            (train_state, opt_state), losses = jax.lax.scan(
                epoch, (train_state, opt_state), None,
                length=self.num_ppo_steps)

        # statistics at the final parameters (optimizer.compute_stats,
        # maml_first_order_optimizer.py:146-163)
        loss_after, aux = loss_fn(train_state)
        metrics = dict(LossBefore=losses[0], LossAfter=loss_after,
                       KLInner=jnp.mean(aux["inner_kls"]),
                       KLOuter=aux["outer_kl"],
                       inner_kls=aux["inner_kls"],
                       # cumulative finite-guard skips (optimizers/adam.py):
                       # a rising value means gradients went non-finite
                       SkippedUpdates=opt_state.skipped)
        return train_state, opt_state, metrics

    # -------------------------------------------------- adaptive KL penalty
    @staticmethod
    def adapt_kl_coeff(kl_coeff, kl_values, kl_target):
        """x2 above 1.5*target, /2 below target/1.5 (pro_mp.py:201-214)."""
        kl_values = np.asarray(kl_values)
        kl_coeff = np.asarray(kl_coeff).copy()
        lo = kl_values < kl_target / 1.5
        hi = kl_values > kl_target * 1.5
        kl_coeff[lo] /= 2.0
        kl_coeff[hi] *= 2.0
        return kl_coeff
