"""Basic 2D point meta-envs (single-task, goal-task, dense-corner variants).

Pure-JAX ports of the semantics of:
  * reference meta_policy_search/envs/point_envs/point_env_2d.py
    (``MetaPointEnv`` — reward -||s||, done near origin, action +-0.1,
    reset U(-2,2)^2, trivial {} tasks)
  * reference meta_policy_search/envs/point_envs/point_env_2d_v2.py
    (goal tasks ~ U(-2,2)^2, reward -||goal - s||, reset at origin)
  * reference meta_policy_search/envs/point_envs/corner_goals_point_env_2d.py
    (same dynamics as point_env_2d.py; registered under its own name)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.envs.base import Box, TaskEnv, register_env


@register_env("MetaPointEnv")
@dataclass(frozen=True)
class MetaPointEnv(TaskEnv):
    """Single-task point env: reward -||s||, done when |s_i| < 0.01."""

    stochastic_step: bool = False
    observation_space: Box = Box(-jnp.inf, jnp.inf, (2,))
    action_space: Box = Box(-0.1, 0.1, (2,))

    def sample_tasks(self, key, n_tasks):
        # Tasks carry no information (point_env_2d.py:63-64 returns [{}]*n).
        return jnp.zeros((n_tasks, 0))

    def reset(self, key, task):
        state = jax.random.uniform(key, (2,), jnp.float32, -2.0, 2.0)
        return state, state

    def step(self, state, action, task, key):
        new = state + jnp.clip(action, -0.1, 0.1)
        reward = -jnp.sqrt(new[0] ** 2 + new[1] ** 2)
        done = jnp.logical_and(jnp.abs(new[0]) < 0.01, jnp.abs(new[1]) < 0.01)
        return new, new, reward, done, {}


@register_env("MetaPointEnvV2")
@dataclass(frozen=True)
class MetaPointEnvV2(TaskEnv):
    """Goal tasks ~ U(-2,2)^2; reward -||goal - s||; reset at origin."""

    stochastic_step: bool = False
    observation_space: Box = Box(-jnp.inf, jnp.inf, (2,))
    action_space: Box = Box(-0.1, 0.1, (2,))

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(key, (n_tasks, 2), jnp.float32, -2.0, 2.0)

    def reset(self, key, task):
        state = jnp.zeros((2,), jnp.float32)
        return state, state

    def step(self, state, action, task, key):
        new = state + jnp.clip(action, -0.1, 0.1)
        reward = -jnp.sqrt(jnp.sum((task - new) ** 2))
        done = jnp.logical_and(jnp.abs(new[0]) < 0.01, jnp.abs(new[1]) < 0.01)
        return new, new, reward, done, {}


@register_env("MetaPointEnvCornerGoals")
@dataclass(frozen=True)
class MetaPointEnvCornerGoals(MetaPointEnv):
    """corner_goals_point_env_2d.py — identical dynamics to MetaPointEnv."""


@register_env("MetaPointEnvMomentum")
@dataclass(frozen=True)
class MetaPointEnvMomentum(TaskEnv):
    """Velocity-integrating point mass with corner-goal tasks.

    never_done/deterministic flags let the rollout scan drop its
    auto-reset and per-step key-split branches.

    Port of point_env_2d_momentum.py: obs = (pos, vel) in R^4, action
    +-0.1 added to velocity, sparse reward max(radius - ||goal - pos||, 0)
    (:70-76), reset pos ~ U(-0.2,0.2)^2, vel ~ U(-0.1,0.1)^2 (:50-53).
    """

    reward_type: str = "sparse"
    sparse_reward_radius: float = 2.0
    never_done: bool = True
    stochastic_step: bool = False

    observation_space: Box = Box(-jnp.inf, jnp.inf, (4,))
    action_space: Box = Box(-0.1, 0.1, (2,))

    def sample_tasks(self, key, n_tasks):
        corners = jnp.array([[-2.0, -2.0], [2.0, -2.0], [-2.0, 2.0], [2.0, 2.0]])
        idx = jax.random.randint(key, (n_tasks,), 0, 4)
        return corners[idx]

    def reset(self, key, task):
        kp, kv = jax.random.split(key)
        pos = jax.random.uniform(kp, (2,), jnp.float32, -0.2, 0.2)
        vel = jax.random.uniform(kv, (2,), jnp.float32, -0.1, 0.1)
        state = {"pos": pos, "vel": vel}
        return state, jnp.concatenate([pos, vel])

    def step(self, state, action, task, key):
        vel = state["vel"] + jnp.clip(action, -0.1, 0.1)
        pos = state["pos"] + vel
        goal_distance = jnp.linalg.norm(pos - task)
        if self.reward_type == "dense":
            reward = -goal_distance
        elif self.reward_type == "dense_squared":
            reward = -goal_distance**2
        else:
            reward = jnp.maximum(self.sparse_reward_radius - goal_distance, 0.0)
        new_state = {"pos": pos, "vel": vel}
        obs = jnp.concatenate([pos, vel])
        return new_state, obs, reward, jnp.array(False), {}
