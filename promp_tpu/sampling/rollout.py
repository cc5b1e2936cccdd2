"""Fused on-device rollout engine.

TPU-native replacement for the reference's MetaSampler + vectorized env
executors (reference: meta_policy_search/samplers/meta_sampler.py:59-137,
vectorized_env_executor.py). The reference's hot loop does, per env step:
a host->TF ``sess.run`` for actions (feeding every adapted parameter array
every step, meta_gaussian_mlp_policy.py:139-157), a pickle round-trip per
worker process, and a pure-Python loop appending to path lists. Here the
policy apply, action sampling, env step and auto-reset are fused into one
``lax.scan`` over time, ``vmap``-ed over the (meta-task, env) axes, so an
entire sampling round is a single XLA computation with no host involvement
(SURVEY.md §7.3: this is where the throughput target comes from).

Output buffers are fixed-shape ``(tasks, envs, T, ...)`` with:
  * ``dones``      — episode-final step markers (auto-reset happens on the
                     next step inside the scan),
  * ``timesteps``  — segment-relative step index (resets to 0 after a done),
so downstream processing reproduces the reference's ragged-path math via
masked/reset-aware scans (tests/test_samplers.py:308-361 is the oracle for
this equivalence).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


def _tree_where(pred, on_true, on_false):
    """Select pytree leaves by a (broadcastable-from-left) predicate."""
    def sel(a, b):
        p = pred.reshape(pred.shape + (1,) * (a.ndim - pred.ndim))
        return jnp.where(p, a, b)
    return jax.tree.map(sel, on_true, on_false)


def rollout(env, policy, params, tasks, key, n_envs, horizon, floor_std=True):
    """Collect ``n_envs`` rollouts of length ``horizon`` for every task.

    Args:
        env: TaskEnv (pure functions).
        policy: GaussianMLPPolicy.
        params: param pytree with a leading task axis (tasks, ...) — use
            ``policy.replicate`` for the pre-update (shared-params) round,
            the analog of ``switch_to_pre_update`` (policies/base.py:234-240).
        tasks: task pytree with leading axis (tasks,).
        key: PRNG key for resets, action noise and env stochasticity.
        n_envs: envs per task (= rollouts_per_meta_task when episodes run to
            the horizon, meta_sampler.py:38).
        horizon: max_path_length.
        floor_std: apply the min-log-std floor in the policy forward (True
            for the pre-update round — the tf.Variable read path — False for
            post-update rounds fed by adapted params; see
            gaussian_mlp_policy.py:71 vs :164-184).

    Returns:
        dict with leaves shaped (tasks, envs, horizon, ...):
        observations, actions, rewards, dones, timesteps,
        agent_infos{mean, log_std}, env_infos{...}.
    """
    n_tasks = jax.tree.leaves(tasks)[0].shape[0]
    key_reset, key_scan = jax.random.split(key)
    never_done = getattr(env, "never_done", False)
    stochastic = getattr(env, "stochastic_step", True)

    # initial reset: one key per (task, env)
    reset_keys = jax.random.split(key_reset, n_tasks * n_envs).reshape(
        n_tasks, n_envs, -1)
    reset_fn = jax.vmap(lambda ks, t: jax.vmap(env.reset, in_axes=(0, None))(ks, t))
    state0, obs0 = reset_fn(reset_keys, tasks)

    apply_tasks = jax.vmap(partial(policy.apply, floor_std=floor_std))

    def step_fn(carry, key_t):
        state, obs, t_seg = carry
        k_noise, k_step, k_reset = jax.random.split(key_t, 3)

        dist_info = apply_tasks(params, obs)  # (tasks, envs, act)
        noise = jax.random.normal(k_noise, dist_info["mean"].shape,
                                  dist_info["mean"].dtype)
        actions = dist_info["mean"] + noise * jnp.exp(dist_info["log_std"])

        if stochastic:
            step_keys = jax.random.split(k_step, n_tasks * n_envs).reshape(
                n_tasks, n_envs, -1)
        else:
            # deterministic dynamics: reuse one key, XLA drops it entirely
            step_keys = jnp.broadcast_to(k_step, (n_tasks, n_envs)
                                         + k_step.shape)
        step_env = jax.vmap(
            lambda s, a, t, ks: jax.vmap(env.step, in_axes=(0, 0, None, 0))(s, a, t, ks))
        new_state, new_obs, rewards, dones, env_infos = step_env(
            state, actions, tasks, step_keys)
        dones_f = dones.astype(jnp.bool_)

        if never_done:
            # episodes only end at the horizon — no auto-reset branch
            next_state, next_obs = new_state, new_obs
            next_t_seg = t_seg + 1
        else:
            # auto-reset terminated envs (vectorized_env_executor.py:44-50),
            # carrying running stats through episode boundaries
            # (normalized_env.py keeps EMA stats across resets)
            rk = jax.random.split(k_reset, n_tasks * n_envs).reshape(
                n_tasks, n_envs, -1)
            rc = getattr(env, "reset_carry", None) or (
                lambda s, k, t: env.reset(k, t))
            reset_carry_fn = jax.vmap(
                lambda ss, ks, t: jax.vmap(
                    rc, in_axes=(0, 0, None))(ss, ks, t))
            re_state, re_obs = reset_carry_fn(new_state, rk, tasks)
            next_state = _tree_where(dones_f, re_state, new_state)
            next_obs = jnp.where(dones_f[..., None], re_obs, new_obs)
            next_t_seg = jnp.where(dones_f, 0, t_seg + 1)

        out = dict(
            observations=obs,
            actions=actions,
            rewards=rewards,
            dones=dones_f,
            timesteps=t_seg,
            agent_infos=dist_info,
            env_infos=env_infos,
        )
        return (next_state, next_obs, next_t_seg), out

    t_seg0 = jnp.zeros((n_tasks, n_envs), jnp.int32)
    step_keys = jax.random.split(key_scan, horizon)
    _, traj = jax.lax.scan(step_fn, (state0, obs0, t_seg0), step_keys)

    # (T, tasks, envs, ...) -> (tasks, envs, T, ...)
    return jax.tree.map(lambda x: jnp.moveaxis(x, 0, 2), traj)


def segment_starts(timesteps):
    """0/1 mask of positions that begin an episode segment."""
    return (timesteps == 0).astype(jnp.float32)


def segment_returns(rewards, timesteps, dones):
    """Per-segment undiscounted return statistics on auto-reset streams.

    Returns (seg_sums, seg_mask) with the same (..., T) shape: ``seg_sums``
    holds each segment's total reward at the segment's *final* position
    (done position or the stream end), ``seg_mask`` marks those positions.
    Mirrors the reference's per-path ``sum(path["rewards"])``
    (samplers/base.py:137-149) without ragged paths.
    """
    ends = jnp.concatenate(
        [dones[..., :-1].astype(jnp.float32),
         jnp.ones_like(dones[..., :1], jnp.float32)], axis=-1)
    csum = jnp.cumsum(rewards, axis=-1)
    # cumulative sum just before each segment started
    start_mask = (timesteps == 0)
    prev_csum = jnp.concatenate(
        [jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)
    seg_base = jnp.where(start_mask, prev_csum, 0.0)
    # forward-fill the base across each segment
    def ffill(carry, x):
        base, is_start = x
        carry = jnp.where(is_start, base, carry)
        return carry, carry
    moved_base = jnp.moveaxis(seg_base, -1, 0)
    moved_start = jnp.moveaxis(start_mask, -1, 0)
    _, filled = jax.lax.scan(ffill, jnp.zeros_like(moved_base[0]),
                             (moved_base, moved_start))
    filled = jnp.moveaxis(filled, 0, -1)
    seg_sums = (csum - filled) * ends
    return seg_sums, ends
