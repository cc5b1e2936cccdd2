"""Reference-RNG-compatible host sampler (seed-exact parity mode).

BASELINE.md asks for seed-exact point-mass trajectories vs the reference.
The native engine uses counter-based JAX PRNG; the reference consumes a
single global numpy MT19937 stream in a specific order (SURVEY.md §7.3):

  np.random.seed(seed)                       (utils.py:161-177 set_seed)
  env.sample_tasks -> np.random.choice       (point_env_2d_corner.py:86-87)
  per-iteration, per env step:
    policy action noise: np.random.normal    (gaussian_mlp_policy.py:112-113
                                              — the TF-sampled action is
                                              DISCARDED and re-sampled in
                                              numpy)
    env resets: np.random.uniform            (point_env_2d_corner.py:50)

This module replays that consumption order with numpy's own MT19937 (which
IS the reference's generator — no reimplementation needed) around policy
mean/log_std evaluations done with our JAX policy. Given identical policy
parameters, trajectories match the reference bit-for-bit in float64.

The iterative (non-parallel) executor path is modeled: envs are reset
sequentially per task block and stepped in lockstep
(vectorized_env_executor.py:7-85). Intended for parity tests and
cross-checks, not for the training hot path.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


class CompatPointMassSampler:
    """Replays the reference's numpy RNG stream for MetaPointEnvCorner.

    Args:
        policy: GaussianMLPPolicy (JAX), with params supplied per call.
        meta_batch_size, envs_per_task, max_path_length: reference config.
        normalization_scale: the NormalizedEnv action scale (10.0).
    """

    CORNERS = [np.array([-2.0, -2.0]), np.array([2.0, -2.0]),
               np.array([-2.0, 2.0]), np.array([2.0, 2.0])]

    def __init__(self, policy, meta_batch_size, envs_per_task,
                 max_path_length, seed=1, reward_type="sparse",
                 sparse_reward_radius=0.5, normalization_scale=10.0,
                 dtype=jnp.float32):
        self.policy = policy
        self.meta_batch_size = meta_batch_size
        self.envs_per_task = envs_per_task
        self.max_path_length = max_path_length
        self.reward_type = reward_type
        self.sparse_reward_radius = sparse_reward_radius
        self.normalization_scale = normalization_scale
        # float64 mode for the full-pipeline oracle test (the reference's
        # host arithmetic is float64 numpy around a float32 TF forward;
        # dtype=float64 makes BOTH sides exact for semantic comparison)
        self.dtype = dtype
        np.random.seed(seed)

    # ----------------------------------------------------- RNG-faithful env
    def sample_tasks(self):
        """point_env_2d_corner.py:86-87 (np.random.choice on 4 corners)."""
        idx = np.random.choice(range(4), size=self.meta_batch_size)
        return [self.CORNERS[i] for i in idx]

    def _reset(self):
        return np.random.uniform(-0.2, 0.2, size=(2,))

    def _reward(self, prev_state, state, goal):
        goal_distance = np.linalg.norm(state - goal)
        if self.reward_type == "dense":
            return -goal_distance
        if self.reward_type == "dense_squared":
            return -goal_distance**2
        if np.linalg.norm(state, ord=1) < self.sparse_reward_radius:
            return 0.0
        dists = [np.linalg.norm(state - c) for c in self.CORNERS]
        if goal_distance == min(dists):
            return np.linalg.norm(prev_state - goal) - goal_distance
        return 0.0

    # -------------------------------------------------------------- sampling
    def obtain_samples(self, task_params, tasks, floor_std=True):
        """One sampling round (meta_sampler.py:59-137 lockstep loop).

        Args:
            task_params: policy params pytree with leading task axis.
            tasks: list of goal arrays (len meta_batch_size).

        Returns:
            list (per task) of dicts with (envs, T, .) arrays.
        """
        n_t, n_e, T = self.meta_batch_size, self.envs_per_task, \
            self.max_path_length
        # env resets happen env-by-env at executor construction order
        states = np.stack([[self._reset() for _ in range(n_e)]
                           for _ in range(n_t)])  # (n_t, n_e, 2)
        apply_fn = jax.jit(jax.vmap(
            lambda p, o: self.policy.apply(p, o, floor_std=floor_std)))

        obs_buf = np.zeros((n_t, n_e, T, 2))
        act_buf = np.zeros((n_t, n_e, T, 2))
        rew_buf = np.zeros((n_t, n_e, T))
        mean_buf = np.zeros((n_t, n_e, T, 2))
        logstd_buf = np.zeros((n_t, n_e, T, 2))

        for t in range(T):
            dist = apply_fn(task_params, jnp.asarray(states, self.dtype))
            means = np.asarray(dist["mean"], np.float64)
            log_stds = np.asarray(dist["log_std"], np.float64)
            # the policy re-samples its action in numpy on the
            # CONCATENATED (n_t*n_e, act) batch (gaussian_mlp_policy.py:112)
            rnd = np.random.normal(size=(n_t * n_e, 2))
            actions = (means.reshape(-1, 2)
                       + rnd * np.exp(log_stds.reshape(-1, 2))
                       ).reshape(n_t, n_e, 2)
            obs_buf[:, :, t] = states
            act_buf[:, :, t] = actions
            mean_buf[:, :, t] = means
            logstd_buf[:, :, t] = log_stds
            # normalized env action rescale (normalized_env.py:109-117)
            lb, ub = -0.2, 0.2
            s = self.normalization_scale
            scaled = lb + (actions + s) * (ub - lb) / (2 * s)
            scaled = np.clip(scaled, lb, ub)
            for i in range(n_t):
                for e in range(n_e):
                    prev = states[i, e]
                    new = prev + np.clip(scaled[i, e], -0.2, 0.2)
                    rew_buf[i, e, t] = self._reward(prev, new, tasks[i])
                    states[i, e] = new

        return [dict(observations=obs_buf[i], actions=act_buf[i],
                     rewards=rew_buf[i],
                     agent_infos=dict(mean=mean_buf[i],
                                      log_std=logstd_buf[i]))
                for i in range(self.meta_batch_size)]
