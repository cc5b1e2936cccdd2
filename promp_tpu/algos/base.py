"""Shared MAML machinery: differentiable inner adaptation, unrolled graphs.

TPU-native analog of the reference's ``MAMLAlgo`` base (reference:
meta_policy_search/meta_algos/base.py:89-313). The reference builds
``meta_batch_size`` TF sub-graphs per inner step, each fed per-task
placeholders and per-task parameter placeholders; here the inner step is a
single pure function ``theta' = theta - alpha * grad(L_inner)(theta)``
(base.py:192-215 ``_adapt_sym``) ``vmap``-ed over the task axis, and the
meta-objective differentiates straight through the unrolled adaptation with
``jax.grad`` — second-order terms included, exactly like the reference's
symbolic graph (SURVEY.md §7.3 "grad-through-adaptation correctness").

Per-parameter inner step sizes are a pytree shaped like the policy params,
initialized to ``inner_lr`` and optionally trainable
(base.py:303-313 ``_create_step_size_vars``).
"""
from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp

from promp_tpu.ops import distributions as dg
from promp_tpu.policies.gaussian_mlp import GaussianMLPPolicy


@dataclass(frozen=True)
class MAMLAlgo:
    """Ctor arg defaults mirror base.py:100."""

    policy: GaussianMLPPolicy
    inner_lr: float = 0.1
    num_inner_grad_steps: int = 1
    trainable_inner_step_size: bool = False

    def init_step_sizes(self, params):
        """Per-parameter inner step sizes (base.py:303-313)."""
        return {k: jnp.full_like(params[k], self.inner_lr)
                for k in self.policy.trainable_keys(params)}

    # Uniform trainer-facing interface; algos override as needed.
    def init_opt_state(self, train_state):
        return ()

    def init_hparams(self):
        return {}

    def update_hparams(self, hparams, metrics):
        return hparams

    def mask_grads(self, grads):
        """Zero gradients of non-trainable leaves (step sizes unless
        ``trainable_inner_step_size``; log_std unless ``learn_std``)."""
        if not self.trainable_inner_step_size:
            grads = dict(grads, step_sizes=jax.tree.map(
                jnp.zeros_like, grads["step_sizes"]))
        if not self.policy.learn_std:
            pg = dict(grads["params"])
            pg["log_std_network/log_std_var"] = jnp.zeros_like(
                pg["log_std_network/log_std_var"])
            grads = dict(grads, params=pg)
        return grads

    # ----------------------------------------------------------- objectives
    def inner_objective(self, params, data, floor_std):
        """Task-specific adaptation objective. Default: likelihood-ratio
        surrogate ``-E[LR * A]`` (pro_mp.py:59-65, trpo_maml.py:50-56).

        ``data`` holds one task's buffers: observations (P, T, obs),
        actions, advantages, agent_infos{mean, log_std}.
        """
        dist = self.policy.apply(params, data["observations"],
                                 floor_std=floor_std)
        lr = dg.likelihood_ratio(data["actions"], data["agent_infos"], dist)
        return -jnp.mean(lr * data["advantages"])

    def log_likelihood_objective(self, params, data, floor_std):
        """``-E[log pi * A]`` inner variant (trpo_maml.py:58-62)."""
        dist = self.policy.apply(params, data["observations"],
                                 floor_std=floor_std)
        logli = dg.log_likelihood(data["actions"], dist)
        return -jnp.mean(logli * data["advantages"])

    # ------------------------------------------------------------ adaptation
    def adapt_step(self, params, step_sizes, data, floor_std=False):
        """One gradient step on the inner objective for ONE task.

        theta' = theta - step_sizes (.) grad L  (base.py:192-215). Only the
        trainable keys are updated; the rest pass through unchanged — the
        analog of non-trainable vars being absent from ``policy_params``.
        """
        grads = jax.grad(self.inner_objective)(params, data, floor_std)
        return {
            k: params[k] - step_sizes[k] * grads[k] if k in step_sizes
            else params[k]
            for k in params
        }

    def adapt(self, task_params, step_sizes, samples_data):
        """Numeric adaptation for sampling (base.py:217-242 ``_adapt``).

        Args:
            task_params: params pytree with leading task axis.
            samples_data: processed buffers (tasks, P, T, ...).

        Returns:
            adapted per-task params (the policy's post-update parameters,
            the analog of ``update_task_parameters``).

        Uses floor_std=False like the reference's adaptation graph, which
        runs the functional forward on parameter placeholders
        (base.py:158-190 -> gaussian_mlp_policy.py:164-184).
        """
        data = self._optimization_view(samples_data)
        return jax.vmap(
            lambda p, d: self.adapt_step(p, step_sizes, d, floor_std=False)
        )(task_params, data)

    # ------------------------------------------------------- unrolled graph
    def unrolled_adaptation(self, params, step_sizes, all_data):
        """Re-derive the adapted parameters symbolically from ``params``.

        Mirrors the meta-graph unroll (pro_mp.py:88-122,
        trpo_maml.py:92-123): step-0 distributions use the floored
        variable-path forward, later steps the raw functional forward.

        Args:
            params: current meta-params (no task axis).
            all_data: list of length num_inner_grad_steps+1 of processed
                samples_data, one per sampling round.

        Returns:
            (per-task adapted params, inner_kls list of per-step scalars).
        """
        n_tasks = jax.tree.leaves(all_data[0])[0].shape[0]
        task_params = self.policy.replicate(params, n_tasks)
        inner_kls = []
        for step in range(self.num_inner_grad_steps):
            data = self._optimization_view(all_data[step])
            floor = step == 0

            def kl_of_task(p, d, floor=floor):
                dist = self.policy.apply(p, d["observations"],
                                         floor_std=floor)
                return jnp.mean(dg.kl(d["agent_infos"], dist))

            kls = jax.vmap(kl_of_task)(task_params, data)
            inner_kls.append(jnp.mean(kls))

            task_params = jax.vmap(
                lambda p, d, floor=floor: self.adapt_step(
                    p, step_sizes, d, floor_std=floor)
            )(task_params, data)
        return task_params, inner_kls

    def _optimization_view(self, samples_data):
        """Subset of the processed buffers used in objectives — the analog
        of ``_optimization_keys`` (pro_mp.py:53)."""
        return dict(
            observations=samples_data["observations"],
            actions=samples_data["actions"],
            advantages=samples_data["advantages"],
            agent_infos=samples_data["agent_infos"],
        )

    # ---------------------------------------------------------- diagnostics
    def post_update_dists(self, task_params, data, floor_std=False):
        return jax.vmap(
            lambda p, d: self.policy.apply(p, d["observations"],
                                           floor_std=floor_std)
        )(task_params, data)
