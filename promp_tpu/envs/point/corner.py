"""2D point-mass meta-env with corner-goal tasks — the default benchmark.

Pure-JAX port of the semantics of reference
meta_policy_search/envs/point_envs/point_env_2d_corner.py
(``MetaPointEnvCorner``, used by run_scripts/pro-mp_run_point_mass.py:100):

  * 4 corner goals (+-2, +-2) sampled uniformly (:86-87)
  * sparse reward = progress toward the goal, but only outside an L1 radius
    of 0.5 from the origin and only when the nearest corner IS the goal
    (:61-76); dense / dense_squared variants supported (:64-67)
  * actions clipped to +-0.2 (:37), episodes never terminate (:39)
  * reset state ~ U(-0.2, 0.2)^2 (:50)
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from promp_tpu.envs.base import Box, TaskEnv, register_env

# numpy (not jnp) so importing the package never forces JAX backend
# initialization; converted lazily inside traced code
CORNERS = np.array([[-2.0, -2.0], [2.0, -2.0], [-2.0, 2.0], [2.0, 2.0]],
                   np.float32)


@register_env("MetaPointEnvCorner")
@dataclass(frozen=True)
class MetaPointEnvCorner(TaskEnv):
    reward_type: str = "sparse"
    sparse_reward_radius: float = 0.5
    never_done: bool = True
    stochastic_step: bool = False

    observation_space: Box = Box(-jnp.inf, jnp.inf, (2,))
    action_space: Box = Box(-0.2, 0.2, (2,))

    def sample_tasks(self, key, n_tasks):
        idx = jax.random.randint(key, (n_tasks,), 0, 4)
        return jnp.asarray(CORNERS)[idx]

    def reset(self, key, task):
        state = jax.random.uniform(key, (2,), jnp.float32, -0.2, 0.2)
        return state, state

    def step(self, state, action, task, key):
        prev = state
        new = prev + jnp.clip(action, -0.2, 0.2)
        goal_distance = jnp.linalg.norm(new - task)
        if self.reward_type == "dense":
            reward = -goal_distance
        elif self.reward_type == "dense_squared":
            reward = -goal_distance**2
        else:  # sparse (point_env_2d_corner.py:68-75)
            dist_from_start = jnp.sum(jnp.abs(new))
            corner_dists = jnp.linalg.norm(new[None, :] - CORNERS, axis=-1)
            # the goal distance uses the SAME axis-reduction norm form as
            # corner_dists: the reference computes both that way
            # (point_env_2d_corner.py:63,72), and mixing in the dot-based
            # vector norm can round 1 ulp differently and flip the
            # nearest-corner tie test at the goal corner (r5 oracle find)
            goal_dist_c = jnp.linalg.norm((new - task)[None, :], axis=-1)[0]
            progress = (jnp.linalg.norm((prev - task)[None, :], axis=-1)[0]
                        - goal_dist_c)
            goal_is_nearest = goal_dist_c <= jnp.min(corner_dists)
            reward = jnp.where(
                dist_from_start < self.sparse_reward_radius,
                0.0,
                jnp.where(goal_is_nearest, progress, 0.0),
            )
        done = jnp.array(False)
        return new, new, reward, done, {}
