"""Sawyer-style goal-conditioned manipulation meta-envs (engine-backed).

Pure-function ports of the reference's sawyer envs (reference:
meta_policy_search/envs/sawyer_envs/sawyer_{push,push_simple,door,
pick_and_place}.py), which are thin adapters exposing multiworld MuJoCo
scenes through the task API (task = sampled goal, sawyer_door.py:17-32) and
reachDist/placeDist diagnostics (sawyer_pick_and_place.py:44-50).

``multiworld`` is not installable in this stack; these envs run on the
in-house rigid-body engine instead (promp_tpu/envs/mujoco/scenes.py): the
end-effector is a velocity-servo body (the mocap-tracking analog of
multiworld's arm), objects are dynamic bodies with gravity and table
contact, and pushing / door-opening happen through sphere-sphere contact
forces inside the rollout scan. The grasp in pick-and-place is the one
kinematic simplification (attach while gripper closed, real physics on
release). Task distributions, observation layouts, reward shapes and
diagnostics keys mirror the round-1 analogs.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp

from promp_tpu.envs.base import Box, TaskEnv, register_env
from promp_tpu.envs.mujoco.engine import Engine
from promp_tpu.envs.mujoco.scenes import (
    sawyer_door_model, sawyer_pick_model, sawyer_push_model)

REACH_RADIUS = 0.08


@dataclass(frozen=True)
class SawyerBase(TaskEnv):
    """Shared: the engine scene, EE/obj state accessors, stepping."""

    never_done: bool = True
    stochastic_step: bool = False
    frame_skip: int = 4
    diagnostics_keys = ("reachDist", "placeDist")

    action_space: Box = Box(-1.0, 1.0, (3,))

    def _model(self):
        raise NotImplementedError

    @cached_property
    def engine(self):
        return Engine(self._model(), n_substeps=1)

    @property
    def model(self):
        return self.engine.model

    @property
    def dt(self):
        return self.model.timestep * self.frame_skip

    def _advance(self, state, ctrl):
        q, qd = self.engine.step(state["q"], state["qd"], ctrl,
                                 self.frame_skip)
        return dict(state, q=q, qd=qd)

    def _ee(self, state):
        return state["q"][:3]

    def diagnostics(self, samples):
        out = {}
        for k in self.diagnostics_keys:
            if k in samples["env_infos"]:
                out[f"Average{k[0].upper()}{k[1:]}"] = jnp.mean(
                    samples["env_infos"][k])
        return out


@register_env("SawyerPushEnv")
@dataclass(frozen=True)
class SawyerPushEnv(SawyerBase):
    """Push the puck to a sampled goal on the table (sawyer_push.py).

    Task = goal (x, y) for the object; obs = [ee(3), obj(3)];
    reward = -(reachDist + placeDist); the puck moves only by real
    EE-puck contact forces and decelerates by table friction."""

    observation_space: Box = Box(-jnp.inf, jnp.inf, (6,))

    def _model(self):
        return sawyer_push_model()

    def _obj(self, state):
        return state["q"][3:6]

    def _obs(self, state):
        return jnp.concatenate([self._ee(state), self._obj(state)])

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(
            key, (n_tasks, 2), jnp.float32,
            jnp.array([-0.2, 0.5]), jnp.array([0.2, 0.75]))

    def reset(self, key, task):
        ke, ko = jax.random.split(key)
        q = jnp.asarray(self.model.init_qpos, jnp.float32)
        q = q.at[:3].add(jax.random.uniform(ke, (3,), jnp.float32,
                                            -0.02, 0.02))
        q = q.at[3:5].add(jax.random.uniform(ko, (2,), jnp.float32,
                                             -0.08, 0.08))
        state = dict(q=q, qd=jnp.zeros_like(q))
        return state, self._obs(state)

    def step(self, state, action, task, key):
        state = self._advance(state, jnp.clip(action[:3], -1.0, 1.0))
        reach_dist = jnp.linalg.norm(self._ee(state) - self._obj(state))
        place_dist = jnp.linalg.norm(self._obj(state)[:2] - task)
        reward = -(reach_dist + place_dist)
        info = dict(reachDist=reach_dist, placeDist=place_dist)
        return (state, self._obs(state), reward, jnp.array(False), info)


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

    Task = target door angle; the door is a hinged panel the EE pushes
    open through the handle contact sphere; obs = [ee(3), angle,
    handle(3)]."""

    observation_space: Box = Box(-jnp.inf, jnp.inf, (7,))
    hinge_pos: tuple = (0.2, 0.7, 0.1)
    door_len: float = 0.25
    diagnostics_keys = ("reachDist", "angleDelta")

    def _model(self):
        return sawyer_door_model(self.hinge_pos, self.door_len)

    def _handle(self, angle):
        hp = jnp.asarray(self.hinge_pos)
        return hp + self.door_len * jnp.array(
            [-jnp.cos(angle), -jnp.sin(angle), 0.0])

    def _obs(self, state):
        angle = state["q"][3]
        return jnp.concatenate([self._ee(state), angle[None],
                                self._handle(angle)])

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(key, (n_tasks,), jnp.float32, 0.0, 0.83)

    def reset(self, key, task):
        q = jnp.asarray(self.model.init_qpos, jnp.float32)
        q = q.at[:3].add(jax.random.uniform(key, (3,), jnp.float32,
                                            -0.02, 0.02))
        state = dict(q=q, qd=jnp.zeros_like(q))
        return state, self._obs(state)

    def step(self, state, action, task, key):
        state = self._advance(state, jnp.clip(action[:3], -1.0, 1.0))
        angle = state["q"][3]
        reach_dist = jnp.linalg.norm(self._ee(state) - self._handle(angle))
        angle_delta = jnp.abs(angle - task)
        reward = -(reach_dist + angle_delta)
        info = dict(reachDist=reach_dist, angleDelta=angle_delta)
        return (state, self._obs(state), reward, jnp.array(False), info)


@register_env("SawyerPickAndPlaceEnv")
@dataclass(frozen=True)
class SawyerPickAndPlaceEnv(SawyerPushEnv):
    """Pick the object and place it at a 3D goal
    (sawyer_pick_and_place.py). Task = goal (x, y, z); action gains a
    gripper channel; while grasped (near + gripper closed) the object is
    carried at the EE tip, on release it falls and lands through real
    contact."""

    action_space: Box = Box(-1.0, 1.0, (4,))
    # object rests just below the EE sphere while held (spheres touching,
    # zero penalty force at the hold point)
    hold_offset: tuple = (0.0, 0.0, -0.07)

    def _model(self):
        return sawyer_pick_model()

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(
            key, (n_tasks, 3), jnp.float32,
            jnp.array([-0.15, 0.5, 0.05]), jnp.array([0.15, 0.7, 0.25]))

    def reset(self, key, task):
        state, obs = super().reset(key, task)
        return dict(state, grasp=jnp.zeros(())), obs

    def step(self, state, action, task, key):
        state = self._advance(state, jnp.clip(action[:3], -1.0, 1.0))
        near = (jnp.linalg.norm(self._ee(state) - self._obj(state))
                < REACH_RADIUS)
        grasping = jnp.logical_and(near, action[3] > 0.0)
        # kinematic attach: the object tracks the EE tip while grasped
        hold = self._ee(state) + jnp.asarray(self.hold_offset)
        q = jnp.where(grasping, state["q"].at[3:6].set(hold), state["q"])
        qd = jnp.where(grasping,
                       state["qd"].at[3:6].set(state["qd"][:3]),
                       state["qd"])
        state = dict(state, q=q, qd=qd,
                     grasp=grasping.astype(jnp.float32))
        reach_dist = jnp.linalg.norm(self._ee(state) - self._obj(state))
        place_dist = jnp.linalg.norm(self._obj(state) - task)
        reward = -(reach_dist + place_dist)
        info = dict(reachDist=reach_dist, placeDist=place_dist)
        return (state, self._obs(state), reward, jnp.array(False), info)
