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
release).

Rewards (round 5, VERDICT r4 item 3): the reference pins
``dennisl88/multiworld@russell`` whose source is unreachable in this
container (zero egress), so the SHAPED staged rewards are ported from the
same author's successor implementation of these scenes (R. Mendonca's
Sawyer push / pick-place shaping, as published in Meta-World's
sawyer_reach_push_pick_place.py): a reach term ``-reachDist`` always on,
and a GATED progress bonus
``1000*(maxDist - dist) + c1*(exp(-dist^2/c2) + exp(-dist^2/c3))``
(c1=1000, c2=1e-2, c3=1e-3, clamped >= 0) that turns on once the hand
reaches the object — the shaping the reference's own wrapper relies on
(its diagnostics read reachDist / placeDist / reachRew / pickRew /
placeRew from env infos, sawyer_push.py:45-50,
sawyer_pick_and_place.py:44-56). ``SawyerPushSimpleEnv`` mirrors the
reference call site exactly: fixed object start, goals in
[-0.2, 0.6] x [0.2, 0.8], ``rew_mode='posPlace'`` (positive place
progress, sawyer_push_simple.py:15-21). Note the reference's
sawyer_door.py is a verbatim copy of the push wrapper (it wraps
multiworld's SawyerPushEnv and never references a door); the door env
here is a genuine door scene kept as a capability superset.
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

# shaped-reward constants (multiworld-lineage, see module docstring)
C1, C2, C3 = 1000.0, 0.01, 0.001
# multiworld gates the push bonus at fingerCOM-to-object < 0.05, where
# the fingers can straddle the object (reachDist -> ~0). Here the EE and
# object are SPHERES whose centers cannot get closer than the sum of
# their radii (0.07 in the push scene), so the gate is expressed as a
# margin above surface contact — a 400-iteration round-5 run with the
# raw 0.05 gate converged to reachDist 0.077 with the bonus never firing
# (benchmarks/validation/SawyerPushEnv_shaped_r5).
TOUCH_MARGIN = 0.04


def progress_bonus(dist, max_dist):
    """``max(1000*(maxDist - dist) + c1*(exp(-d^2/c2) + exp(-d^2/c3)), 0)``
    — the multiworld-lineage gated progress term: a dense linear pull
    toward the goal plus two sharpening exponentials near it."""
    raw = (1000.0 * (max_dist - dist)
           + C1 * (jnp.exp(-dist**2 / C2) + jnp.exp(-dist**2 / C3)))
    return jnp.maximum(raw, 0.0)


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

    @property
    def reach_gate(self):
        """Center distance at which the EE counts as 'at the object': the
        scene's surface-contact distance plus TOUCH_MARGIN."""
        r = self.model.con_radius
        return float(r[0] + r[1]) + TOUCH_MARGIN

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

    Task = goal (x, y) for the object; obs = [ee(3), obj(3)]. Reward is
    the multiworld-lineage shaping (module docstring):
    ``-reachDist + [reachDist < reach_gate] * progress_bonus(placeDist,
    maxPushDist)`` with maxPushDist = the object-to-goal distance at
    reset (carried in env state). The puck moves only by real EE-puck
    contact forces and decelerates by table friction."""

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
        # task[..., :2] so the pick-and-place subclass (3-D goals) can
        # reuse this reset
        state = dict(q=q, qd=jnp.zeros_like(q),
                     max_push_dist=jnp.linalg.norm(q[3:5] - task[..., :2]))
        return state, self._obs(state)

    def step(self, state, action, task, key):
        state = self._advance(state, jnp.clip(action[:3], -1.0, 1.0))
        reach_dist = jnp.linalg.norm(self._ee(state) - self._obj(state))
        place_dist = jnp.linalg.norm(self._obj(state)[:2] - task)
        reach_rew = -reach_dist
        push_rew = jnp.where(reach_dist < self.reach_gate,
                             progress_bonus(place_dist,
                                            state["max_push_dist"]),
                             0.0)
        reward = reach_rew + push_rew
        info = dict(reachDist=reach_dist, placeDist=place_dist,
                    reachRew=reach_rew, pushRew=push_rew)
        return (state, self._obs(state), reward, jnp.array(False), info)


@register_env("SawyerPushSimpleEnv")
@dataclass(frozen=True)
class SawyerPushSimpleEnv(SawyerPushEnv):
    """sawyer_push_simple.py — the reference call site pins a FIXED
    object start (obj_low == obj_high == (0, 0.5, 0.02)), goals in
    [-0.2, 0.6] x [0.2, 0.8], and ``rew_mode='posPlace'``: the positive
    place-progress reward ungated by reach (:15-21)."""

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(
            key, (n_tasks, 2), jnp.float32,
            jnp.array([-0.2, 0.6]), jnp.array([0.2, 0.8]))

    def reset(self, key, task):
        state, obs = super().reset(key, task)
        # fixed object start: undo the puck reset noise
        q = state["q"].at[3:5].set(
            jnp.asarray(self.model.init_qpos, jnp.float32)[3:5])
        state = dict(state, q=q,
                     max_push_dist=jnp.linalg.norm(q[3:5] - task))
        return state, self._obs(state)

    def step(self, state, action, task, key):
        state = self._advance(state, jnp.clip(action[:3], -1.0, 1.0))
        reach_dist = jnp.linalg.norm(self._ee(state) - self._obj(state))
        place_dist = jnp.linalg.norm(self._obj(state)[:2] - task)
        reach_rew = -reach_dist
        push_rew = progress_bonus(place_dist, state["max_push_dist"])
        reward = reach_rew + push_rew
        info = dict(reachDist=reach_dist, placeDist=place_dist,
                    reachRew=reach_rew, pushRew=push_rew)
        return (state, self._obs(state), reward, jnp.array(False), info)


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

    diagnostics_keys = ("reachDist", "placingDist", "reachRew", "pickRew",
                        "placeRew")

    def reset(self, key, task):
        state, obs = super().reset(key, task)
        state = dict(state, grasp=jnp.zeros(()),
                     max_place_dist=jnp.linalg.norm(state["q"][3:6] - task))
        return state, obs

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
        # staged multiworld-lineage shaping (reachRew / pickRew /
        # placeRew — the info keys the reference wrapper logs,
        # sawyer_pick_and_place.py:44-56)
        reach_rew = -reach_dist
        obj_z = self._obj(state)[2]
        height_target = task[2]
        pick_rew = jnp.where(state["grasp"] > 0.0,
                             100.0 * jnp.minimum(height_target, obj_z),
                             0.0)
        place_rew = jnp.where(reach_dist < self.reach_gate,
                              progress_bonus(place_dist,
                                             state["max_place_dist"]),
                              0.0)
        reward = reach_rew + pick_rew + place_rew
        info = dict(reachDist=reach_dist, placingDist=place_dist,
                    reachRew=reach_rew, pickRew=pick_rew,
                    placeRew=place_rew)
        return (state, self._obs(state), reward, jnp.array(False), info)
