"""2D point env with circular walls and random gaps.

Pure-JAX port of the semantics of reference
meta_policy_search/envs/point_envs/point_env_2d_walls.py
(``MetaPointEnvWalls``): corner goals plus two circular walls at radius 1
and 2, each with a random gap; crossing a wall outside its gap pushes the
state back onto/inside the wall (:40-49). Task = {goal, gap_1, gap_2}
(:93-104). The reference's sparse branch returns ``None`` outside the radius
(a latent bug, :80-86); we use 0 there, which is what the dense-progress
formula degrades to.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from promp_tpu.envs.base import Box, TaskEnv, register_env

# numpy so importing the package never forces JAX backend initialization
CORNERS = np.array([[-2.0, -2.0], [2.0, -2.0], [-2.0, 2.0], [2.0, 2.0]],
                   np.float32)


@register_env("MetaPointEnvWalls")
@dataclass(frozen=True)
class MetaPointEnvWalls(TaskEnv):
    reward_type: str = "dense"
    sparse_reward_radius: float = 2.0
    never_done: bool = True
    stochastic_step: bool = False

    observation_space: Box = Box(-jnp.inf, jnp.inf, (2,))
    action_space: Box = Box(-0.2, 0.2, (2,))

    def sample_tasks(self, key, n_tasks):
        kg, k1, k2 = jax.random.split(key, 3)
        goals = jnp.asarray(CORNERS)[jax.random.randint(kg, (n_tasks,), 0, 4)]
        gaps_1 = jax.random.normal(k1, (n_tasks, 2))
        gaps_1 = gaps_1 / jnp.linalg.norm(gaps_1, axis=1, keepdims=True)
        gaps_2 = jax.random.normal(k2, (n_tasks, 2))
        gaps_2 = gaps_2 / (jnp.linalg.norm(gaps_2, axis=1, keepdims=True) / 2.0)
        return {"goal": goals, "gap_1": gaps_1, "gap_2": gaps_2}

    def reset(self, key, task):
        state = jax.random.uniform(key, (2,), jnp.float32, -0.2, 0.2)
        return state, state

    def step(self, state, action, task, key):
        prev = state
        new = prev + jnp.clip(action, -0.2, 0.2)
        reward = self._reward(prev, new, task)

        norm_prev = jnp.linalg.norm(prev)
        norm_new = jnp.linalg.norm(new)
        # wall 1 at radius 1: blocked unless within distance 1 of gap_1
        cross_1 = jnp.logical_and(norm_prev < 1.0, norm_new > 1.0)
        blocked_1 = jnp.linalg.norm(new - task["gap_1"]) > 1.0
        pushed_1 = new / (norm_new + 1e-6)
        new = jnp.where(jnp.logical_and(cross_1, blocked_1), pushed_1, new)
        # wall 2 at radius 2: blocked unless within distance 1 of gap_2
        norm_new = jnp.linalg.norm(new)
        cross_2 = jnp.logical_and(
            jnp.logical_and(norm_prev < 2.0, norm_new > 2.0),
            jnp.logical_not(cross_1))
        blocked_2 = jnp.linalg.norm(new - task["gap_2"]) > 1.0
        pushed_2 = new / (norm_new * 0.5 + 1e-6)
        new = jnp.where(jnp.logical_and(cross_2, blocked_2), pushed_2, new)

        return new, new, reward, jnp.array(False), {}

    def _reward(self, prev, new, task):
        goal = task["goal"]
        goal_distance = jnp.linalg.norm(new - goal)
        if self.reward_type == "dense":
            return -goal_distance
        if self.reward_type == "dense_squared":
            return -goal_distance**2
        progress = jnp.linalg.norm(prev - goal) - goal_distance
        return jnp.where(goal_distance < self.sparse_reward_radius, progress, 0.0)
