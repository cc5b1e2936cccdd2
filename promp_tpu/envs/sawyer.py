"""Sawyer-style goal-conditioned manipulation meta-envs (JAX-native).

The reference's sawyer envs (reference:
meta_policy_search/envs/sawyer_envs/sawyer_{push,push_simple,door,
pick_and_place}.py) are thin adapters over the external ``multiworld``
package's MuJoCo sawyer scenes, exposing goal-sampling as the task API
(sawyer_door.py:17-32). ``multiworld`` is not installable in this stack, so
these are JAX-native simplified-dynamics analogs: end-effector velocity
control with an object (and door hinge / lift height where applicable),
the same goal-as-task structure, flat state observations, and the same
negative-distance reward shape. Task API and shapes mirror the adapters;
dynamics fidelity to the multiworld scenes is approximate by design.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from promp_tpu.envs.base import Box, TaskEnv, register_env

EE_SPEED = 0.05
REACH_RADIUS = 0.06


@dataclass(frozen=True)
class SawyerBase(TaskEnv):
    """Shared: 3D end-effector moved by clipped velocity actions inside a
    tabletop workspace; an object is dragged when the EE is within reach."""

    never_done: bool = True
    stochastic_step: bool = False
    workspace_low: tuple = (-0.3, 0.4, 0.02)
    workspace_high: tuple = (0.3, 0.8, 0.3)
    diagnostics_keys = ("reachDist", "placeDist")

    action_space: Box = Box(-1.0, 1.0, (3,))

    def _clip_ws(self, p):
        return jnp.clip(p, jnp.asarray(self.workspace_low),
                        jnp.asarray(self.workspace_high))

    def _move(self, state, action):
        ee = self._clip_ws(state["ee"] + EE_SPEED * jnp.clip(action[:3],
                                                             -1.0, 1.0))
        delta = ee - state["ee"]
        near = jnp.linalg.norm(state["ee"] - state["obj"]) < REACH_RADIUS
        obj = jnp.where(near, self._clip_ws(state["obj"] + delta),
                        state["obj"])
        return dict(state, ee=ee, obj=obj)


@register_env("SawyerPushEnv")
@dataclass(frozen=True)
class SawyerPushEnv(SawyerBase):
    """Push the puck to a sampled goal on the table (sawyer_push.py).

    Task = goal (x, y) for the object; obs = [ee(3), obj(3)];
    reward = -(reachDist + placeDist) like multiworld's push metric."""

    observation_space: Box = Box(-jnp.inf, jnp.inf, (6,))

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(
            key, (n_tasks, 2), jnp.float32,
            jnp.array([-0.2, 0.5]), jnp.array([0.2, 0.75]))

    def reset(self, key, task):
        ke, ko = jax.random.split(key)
        ee = jnp.array([0.0, 0.45, 0.1]) + jax.random.uniform(
            ke, (3,), jnp.float32, -0.02, 0.02)
        obj = jnp.concatenate([
            jax.random.uniform(ko, (2,), jnp.float32, -0.08, 0.08)
            + jnp.array([0.0, 0.6]), jnp.array([0.02])])
        state = dict(ee=ee, obj=obj)
        return state, jnp.concatenate([ee, obj])

    def step(self, state, action, task, key):
        state = self._move(state, action)
        reach_dist = jnp.linalg.norm(state["ee"] - state["obj"])
        place_dist = jnp.linalg.norm(state["obj"][:2] - task)
        reward = -(reach_dist + place_dist)
        obs = jnp.concatenate([state["ee"], state["obj"]])
        info = dict(reachDist=reach_dist, placeDist=place_dist)
        return state, obs, reward, jnp.array(False), info


@register_env("SawyerPushSimpleEnv")
@dataclass(frozen=True)
class SawyerPushSimpleEnv(SawyerPushEnv):
    """sawyer_push_simple.py — narrower goal distribution."""

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(
            key, (n_tasks, 2), jnp.float32,
            jnp.array([-0.1, 0.55]), jnp.array([0.1, 0.7]))


@register_env("SawyerDoorEnv")
@dataclass(frozen=True)
class SawyerDoorEnv(SawyerBase):
    """Open a door to a sampled target angle (sawyer_door.py).

    Task = target door angle; the door handle follows the EE when grasped;
    obs = [ee(3), door_angle, handle(3)]."""

    observation_space: Box = Box(-jnp.inf, jnp.inf, (7,))
    hinge_pos: tuple = (0.2, 0.7, 0.1)
    door_len: float = 0.25
    diagnostics_keys = ("reachDist", "angleDelta")

    def _handle(self, angle):
        hp = jnp.asarray(self.hinge_pos)
        return hp + self.door_len * jnp.array(
            [-jnp.cos(angle), -jnp.sin(angle), 0.0])

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(key, (n_tasks,), jnp.float32, 0.0, 0.83)

    def reset(self, key, task):
        ee = jnp.array([0.0, 0.45, 0.1]) + jax.random.uniform(
            key, (3,), jnp.float32, -0.02, 0.02)
        angle = jnp.zeros(())
        state = dict(ee=ee, angle=angle)
        return state, jnp.concatenate([ee, angle[None],
                                       self._handle(angle)])

    def step(self, state, action, task, key):
        ee = self._clip_ws(state["ee"] + EE_SPEED * jnp.clip(action[:3],
                                                             -1.0, 1.0))
        handle = self._handle(state["angle"])
        near = jnp.linalg.norm(ee - handle) < REACH_RADIUS
        # grasped handle: door angle tracks the EE's angle about the hinge
        hp = jnp.asarray(self.hinge_pos)
        rel = ee - hp
        ee_angle = jnp.arctan2(-rel[1], -rel[0])
        angle = jnp.where(near, jnp.clip(ee_angle, 0.0, 1.2),
                          state["angle"])
        state = dict(ee=ee, angle=angle)
        reach_dist = jnp.linalg.norm(ee - self._handle(angle))
        angle_delta = jnp.abs(angle - task)
        reward = -(reach_dist + angle_delta)
        obs = jnp.concatenate([ee, angle[None], self._handle(angle)])
        info = dict(reachDist=reach_dist, angleDelta=angle_delta)
        return state, obs, reward, jnp.array(False), info


@register_env("SawyerPickAndPlaceEnv")
@dataclass(frozen=True)
class SawyerPickAndPlaceEnv(SawyerBase):
    """Pick the object and place it at a 3D goal (sawyer_pick_and_place.py).

    Task = goal (x, y, z); the object is carried while the EE grasps it."""

    observation_space: Box = Box(-jnp.inf, jnp.inf, (6,))
    action_space: Box = Box(-1.0, 1.0, (4,))  # + gripper

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(
            key, (n_tasks, 3), jnp.float32,
            jnp.array([-0.15, 0.5, 0.05]), jnp.array([0.15, 0.7, 0.25]))

    def reset(self, key, task):
        ke, ko = jax.random.split(key)
        ee = jnp.array([0.0, 0.45, 0.1]) + jax.random.uniform(
            ke, (3,), jnp.float32, -0.02, 0.02)
        obj = jnp.concatenate([
            jax.random.uniform(ko, (2,), jnp.float32, -0.08, 0.08)
            + jnp.array([0.0, 0.6]), jnp.array([0.02])])
        state = dict(ee=ee, obj=obj, grasp=jnp.zeros(()))
        return state, jnp.concatenate([ee, obj])

    def step(self, state, action, task, key):
        ee = self._clip_ws(state["ee"] + EE_SPEED * jnp.clip(action[:3],
                                                             -1.0, 1.0))
        near = jnp.linalg.norm(ee - state["obj"]) < REACH_RADIUS
        grasping = jnp.logical_and(near, action[3] > 0.0)
        obj = jnp.where(grasping, ee, state["obj"])
        # gravity drops an ungrasped object to the table
        obj = jnp.where(grasping, obj,
                        obj.at[2].set(jnp.maximum(obj[2] - 0.02, 0.02)))
        state = dict(ee=ee, obj=obj,
                     grasp=grasping.astype(jnp.float32))
        reach_dist = jnp.linalg.norm(ee - obj)
        place_dist = jnp.linalg.norm(obj - task)
        reward = -(reach_dist + place_dist)
        obs = jnp.concatenate([ee, obj])
        info = dict(reachDist=reach_dist, placeDist=place_dist)
        return state, obs, reward, jnp.array(False), info
