"""Normalizing env wrapper (action rescale + running obs/reward stats).

Pure-JAX port of the semantics of reference
meta_policy_search/envs/normalized_env.py (``NormalizedEnv`` / ``normalize``):

  * the policy acts in +-normalization_scale (=10); actions are affinely
    rescaled to the wrapped env's bounds and clipped (:109-117)
  * optional running-mean/var normalization of observations and rewards via
    EMA with alpha=0.001 (:73-89) — here the EMA state lives inside the env
    state pytree (per env instance, like the reference's per-copy attrs)
  * reward scaling (:31 hardcodes the effective scale to 1, mirrored here)

When ``normalize_obs``/``normalize_reward`` are off (the reference run
scripts' default) the wrapper adds only the action affine — which XLA fuses
into the rollout scan for free.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax.numpy as jnp

from promp_tpu.envs.base import Box, TaskEnv


@dataclass(frozen=True)
class NormalizedEnv(TaskEnv):
    env: Any = None
    scale_reward: float = 1.0
    normalize_obs: bool = False
    normalize_reward: bool = False
    obs_alpha: float = 0.001
    reward_alpha: float = 0.001
    normalization_scale: float = 10.0

    @property
    def observation_space(self):
        return self.env.observation_space

    @property
    def action_space(self):
        # The policy sees +-normalization_scale (normalized_env.py:45-50).
        return Box(-self.normalization_scale, self.normalization_scale,
                   self.env.action_space.shape)

    @property
    def diagnostics_keys(self):
        return self.env.diagnostics_keys

    def diagnostics(self, samples):
        return self.env.diagnostics(samples)

    @property
    def never_done(self):
        return getattr(self.env, "never_done", False)

    @property
    def stochastic_step(self):
        return getattr(self.env, "stochastic_step", True)

    def sample_tasks(self, key, n_tasks):
        return self.env.sample_tasks(key, n_tasks)

    def _wrap_state(self, inner_state):
        if not (self.normalize_obs or self.normalize_reward):
            return inner_state
        return {
            "inner": inner_state,
            "obs_mean": jnp.zeros(self.env.observation_space.shape),
            "obs_var": jnp.ones(self.env.observation_space.shape),
            "rew_mean": jnp.zeros(()),
            "rew_var": jnp.ones(()),
        }

    def reset(self, key, task):
        inner_state, obs = self.env.reset(key, task)
        state = self._wrap_state(inner_state)
        if self.normalize_obs:
            state, obs = self._norm_obs(state, obs)
        return state, obs

    def reset_carry(self, prev_state, key, task):
        """Auto-reset preserving EMA stats: the reference's ``_obs_mean`` /
        ``_obs_var`` / ``_reward_mean`` are instance attributes NOT touched
        by ``reset`` (normalized_env.py:37,91), so running stats survive
        episode boundaries. Mirror that by carrying them from the
        terminated episode's state into the fresh one."""
        stats = self.normalize_obs or self.normalize_reward
        if not stats:
            return self.reset(key, task)
        prev_inner = prev_state["inner"]
        inner_state, obs = self.env.reset_carry(prev_inner, key, task)
        state = dict(prev_state, inner=inner_state)
        if self.normalize_obs:
            state, obs = self._norm_obs(state, obs)
        return state, obs

    def step(self, state, action, task, key):
        lb = self.env.action_space.low_array()
        ub = self.env.action_space.high_array()
        scale = self.normalization_scale
        scaled = lb + (action + scale) * (ub - lb) / (2.0 * scale)
        scaled = jnp.clip(scaled, lb, ub)

        stats = self.normalize_obs or self.normalize_reward
        inner_state = state["inner"] if stats else state
        inner_state, obs, reward, done, info = self.env.step(
            inner_state, scaled, task, key)
        if stats:
            state = dict(state, inner=inner_state)
        else:
            state = inner_state
        if self.normalize_obs:
            state, obs = self._norm_obs(state, obs)
        if self.normalize_reward:
            state, reward = self._norm_reward(state, reward)
        return state, obs, reward * self.scale_reward, done, info

    # EMA updates mirror normalized_env.py:73-89
    def _norm_obs(self, state, obs):
        a = self.obs_alpha
        mean = (1 - a) * state["obs_mean"] + a * obs
        var = (1 - a) * state["obs_var"] + a * jnp.square(obs - mean)
        state = dict(state, obs_mean=mean, obs_var=var)
        return state, (obs - mean) / (jnp.sqrt(var) + 1e-8)

    def _norm_reward(self, state, reward):
        a = self.reward_alpha
        mean = (1 - a) * state["rew_mean"] + a * reward
        var = (1 - a) * state["rew_var"] + a * jnp.square(reward - mean)
        state = dict(state, rew_mean=mean, rew_var=var)
        return state, reward / (jnp.sqrt(var) + 1e-8)


def normalize(env, **kwargs):
    """Reference-style alias (normalized_env.py:126)."""
    return NormalizedEnv(env=env, **kwargs)
