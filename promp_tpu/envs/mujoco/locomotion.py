"""Planar locomotion meta-envs on the JAX rigid-body engine.

Pure-function ports of the reference's MuJoCo meta-envs (reference:
meta_policy_search/envs/mujoco_envs/*). Task distributions, rewards,
observations, reset noise and termination rules mirror the reference
line-for-line; the physics runs on promp_tpu.envs.mujoco.engine instead of
CPython MuJoCo so everything steps inside the rollout scan.

Covered here (cited per class): HalfCheetah rand-vel/rand-direc, Walker2d
rand-vel/rand-direc, Swimmer rand-vel, plus a Hopper base used by the
rand-params family.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from promp_tpu.envs.base import Box, TaskEnv, register_env
from promp_tpu.envs.mujoco.engine import Engine
from promp_tpu.envs.mujoco.model import get_model


@dataclass(frozen=True)
class LocomotionEnv(TaskEnv):
    """Shared machinery: engine construction, reset noise, stepping."""

    model_name: str = ""
    frame_skip: int = 5
    n_substeps: int = 1
    # reset noise (reference reset_model per env)
    qpos_noise: float = 0.1
    qvel_noise: float = 0.1
    qvel_noise_kind: str = "normal"  # | "uniform"
    stochastic_step: bool = False

    @cached_property
    def engine(self):
        return Engine(get_model(self.model_name), n_substeps=self.n_substeps)

    @property
    def model(self):
        return self.engine.model

    @property
    def dt(self):
        return self.model.timestep * self.frame_skip

    @cached_property
    def action_space(self):
        rng = self.model.act_ctrlrange
        return Box(float(rng[:, 0].min()), float(rng[:, 1].max()),
                   (self.model.nu,))

    @cached_property
    def observation_space(self):
        return Box(-np.inf, np.inf, (self._obs_dim(),))

    def _obs_dim(self):
        raise NotImplementedError

    def _mods(self, task):
        """Physics overrides derived from the task (rand-param envs)."""
        return None

    def reset(self, key, task):
        m = self.model
        kq, kv = jax.random.split(key)
        qpos = jnp.asarray(m.init_qpos, jnp.float32) + jax.random.uniform(
            kq, (m.nv,), jnp.float32, -self.qpos_noise, self.qpos_noise)
        if self.qvel_noise_kind == "normal":
            qvel = jax.random.normal(kv, (m.nv,)) * self.qvel_noise
        else:
            qvel = jax.random.uniform(kv, (m.nv,), jnp.float32,
                                      -self.qvel_noise, self.qvel_noise)
        state = {"q": qpos, "qd": qvel}
        return state, self._obs(state, task)

    def _advance(self, state, action, task):
        q, qd = self.engine.step(state["q"], state["qd"], action,
                                 self.frame_skip, self._mods(task))
        return {"q": q, "qd": qd}


# --------------------------------------------------------------- HalfCheetah
@dataclass(frozen=True)
class HalfCheetahBase(LocomotionEnv):
    """Obs = [qpos[1:], qvel] (half_cheetah_rand_vel.py:42-46); reset noise
    qpos U(-.1,.1), qvel N(0,.1) (:48-52); frame_skip 5; never done."""

    model_name: str = "half_cheetah"
    frame_skip: int = 5
    # implicit contact spring-dampers in the integrator solve keep h=0.01
    # stable even under N(0,1) random torques (round 1 needed nsub=2)
    n_substeps: int = 1
    never_done: bool = True
    diagnostics_keys = ("forward_vel", "reward_run", "reward_ctrl")

    def _obs_dim(self):
        return 2 * self.model.nv - 1

    def _obs(self, state, task=None):
        return jnp.concatenate([state["q"][1:], state["qd"]])


@register_env("HalfCheetahRandVelEnv")
@dataclass(frozen=True)
class HalfCheetahRandVelEnv(HalfCheetahBase):
    """Task = goal velocity ~ U(0,3) (half_cheetah_rand_vel.py:13-14);
    reward = -|v_x - v*| - 0.05 ||a||^2 (:30-40)."""

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(key, (n_tasks,), jnp.float32, 0.0, 3.0)

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward_ctrl = -0.5 * 0.1 * jnp.sum(jnp.square(action))
        reward_run = -jnp.abs(forward_vel - task)
        reward = reward_ctrl + reward_run
        info = dict(forward_vel=forward_vel, reward_run=reward_run,
                    reward_ctrl=reward_ctrl)
        return state, self._obs(state, task), reward, jnp.array(False), info

    def diagnostics(self, samples):
        """Mirror of half_cheetah_rand_vel.py:57-64, including the
        reference's quirk of logging the STD of ctrl cost under the
        'AvgCtrlCost' name (:64)."""
        out = super().diagnostics(samples)
        vel = samples["env_infos"]["forward_vel"]       # (tasks, envs, T)
        ctrl = -samples["env_infos"]["reward_ctrl"]
        out["AvgForwardVel"] = jnp.mean(vel)
        out["AvgFinalForwardVel"] = jnp.mean(vel[..., -1])
        out["AvgCtrlCost"] = jnp.std(ctrl)
        return out


@register_env("HalfCheetahRandDirecEnv")
@dataclass(frozen=True)
class HalfCheetahRandDirecEnv(HalfCheetahBase):
    """Task in {-1,+1} (half_cheetah_rand_direc.py:14-18); reward =
    dir * v_x - ctrl cost (:32-41)."""

    def sample_tasks(self, key, n_tasks):
        return jnp.where(jax.random.bernoulli(key, 0.5, (n_tasks,)),
                         1.0, -1.0)

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward_ctrl = -0.5 * 0.1 * jnp.sum(jnp.square(action))
        reward_run = task * forward_vel
        reward = reward_ctrl + reward_run
        info = dict(reward_run=reward_run, reward_ctrl=reward_ctrl)
        return state, self._obs(state, task), reward, jnp.array(False), info


# ------------------------------------------------------------------ Walker2d
@dataclass(frozen=True)
class Walker2dBase(LocomotionEnv):
    """Obs = [qpos[1:], clip(qvel, +-10)] (walker2d_rand_vel.py:44-47);
    reset noise U(-.005,.005) both (:49-53); frame_skip 8; done when height
    or torso angle leave [0.8, 2.0] x [-1, 1] (:38-39)."""

    model_name: str = "walker2d"
    frame_skip: int = 8
    qpos_noise: float = 0.005
    qvel_noise: float = 0.005
    qvel_noise_kind: str = "uniform"

    def _obs_dim(self):
        return 2 * self.model.nv - 1

    def _obs(self, state, task=None):
        return jnp.concatenate([state["q"][1:],
                                jnp.clip(state["qd"], -10.0, 10.0)])

    def _done(self, state):
        height, ang = state["q"][1], state["q"][2]
        healthy = ((height > 0.8) & (height < 2.0)
                   & (ang > -1.0) & (ang < 1.0))
        return jnp.logical_not(healthy)


@register_env("Walker2DRandVelEnv")
@dataclass(frozen=True)
class Walker2DRandVelEnv(Walker2dBase):
    """Task vel ~ U(0,10) (walker2d_rand_vel.py:12-13); reward =
    -|v - v*| + 15 alive bonus - 1e-3||a||^2 (:28-41)."""

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(key, (n_tasks,), jnp.float32, 0.0, 10.0)

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward = (-jnp.abs(forward_vel - task) + 15.0
                  - 1e-3 * jnp.sum(jnp.square(action)))
        return (state, self._obs(state, task), reward, self._done(state),
                dict(forward_vel=forward_vel))


@register_env("Walker2DRandDirecEnv")
@dataclass(frozen=True)
class Walker2DRandDirecEnv(Walker2dBase):
    """Task in {-1,+1}; reward = dir*v + 1 alive - 1e-3||a||^2
    (walker2d_rand_direc.py:28-39)."""

    def sample_tasks(self, key, n_tasks):
        return jnp.where(jax.random.bernoulli(key, 0.5, (n_tasks,)),
                         1.0, -1.0)

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward = (task * forward_vel + 1.0
                  - 1e-3 * jnp.sum(jnp.square(action)))
        return (state, self._obs(state, task), reward, self._done(state),
                dict(forward_vel=forward_vel))


# ------------------------------------------------------------------- Swimmer
@register_env("SwimmerRandVelEnv")
@dataclass(frozen=True)
class SwimmerRandVelEnv(LocomotionEnv):
    """Task vel ~ U(0.1, 0.2) (swimmer_rand_vel.py:13-16); reward =
    +|v - v*|... the reference's reward_fwd is the raw |v - v*| gap WITHOUT
    negation (swimmer_rand_vel.py:33 — mirrored faithfully) minus 1e-4
    ctrl cost; obs = [qpos[2:], qvel] (:39-42); reset noise U(-.1,.1) both;
    frame_skip 4; never done."""

    model_name: str = "swimmer"
    frame_skip: int = 4
    never_done: bool = True
    qpos_noise: float = 0.1
    qvel_noise: float = 0.1
    qvel_noise_kind: str = "uniform"
    diagnostics_keys = ("reward_fwd", "reward_ctrl")

    def sample_tasks(self, key, n_tasks):
        return jax.random.uniform(key, (n_tasks,), jnp.float32, 0.1, 0.2)

    def _obs_dim(self):
        return 2 * self.model.nv - 2

    def _obs(self, state, task=None):
        return jnp.concatenate([state["q"][2:], state["qd"]])

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward_fwd = jnp.abs(forward_vel - task)
        reward_ctrl = -1e-4 * jnp.sum(jnp.square(action))
        reward = reward_fwd + reward_ctrl
        info = dict(reward_fwd=reward_fwd, reward_ctrl=reward_ctrl)
        return state, self._obs(state, task), reward, jnp.array(False), info

    def diagnostics(self, samples):
        """Mirror of swimmer_rand_vel.py:54-62: 'ForwardProgress' is the
        last-minus-first value of observation column -3 per path (a
        reference quirk — that column is qvel[2], mirrored faithfully),
        with Average/Max/Min/Std spreads across paths."""
        out = super().diagnostics(samples)
        obs = samples["observations"]                    # (tasks, envs, T, d)
        progs = obs[..., -1, -3] - obs[..., 0, -3]       # per (task, env)
        out["AverageForwardProgress"] = jnp.mean(progs)
        out["MaxForwardProgress"] = jnp.max(progs)
        out["MinForwardProgress"] = jnp.min(progs)
        out["StdForwardProgress"] = jnp.std(progs)
        return out


# -------------------------------------------------------------------- Hopper
@register_env("HopperEnv")
@dataclass(frozen=True)
class HopperEnv(LocomotionEnv):
    """Hopper base (gym semantics) — the reference uses it only through the
    external rand_param_envs package (SURVEY.md §2.7); provided here as the
    base for HopperRandParamsEnv. Reward = v_x + 1 alive - 1e-3||a||^2;
    done outside healthy ranges."""

    model_name: str = "hopper"
    frame_skip: int = 4
    qpos_noise: float = 0.005
    qvel_noise: float = 0.005
    qvel_noise_kind: str = "uniform"

    def sample_tasks(self, key, n_tasks):
        return jnp.zeros((n_tasks, 0))

    def _obs_dim(self):
        return 2 * self.model.nv - 1

    def _obs(self, state, task=None):
        return jnp.concatenate([state["q"][1:],
                                jnp.clip(state["qd"], -10.0, 10.0)])

    def step(self, state, action, task, key):
        x_before = state["q"][0]
        state = self._advance(state, action, task)
        forward_vel = (state["q"][0] - x_before) / self.dt
        reward = forward_vel + 1.0 - 1e-3 * jnp.sum(jnp.square(action))
        height, ang = state["q"][1], state["q"][2]
        s = state["q"][2:]
        healthy = ((height > 0.7) & (jnp.abs(ang) < 0.2)
                   & jnp.all(jnp.abs(s) < 100.0))
        done = jnp.logical_not(healthy)
        return (state, self._obs(state, task), reward, done,
                dict(forward_vel=forward_vel))
